from folder1.file2 import Person


def make_person():
    return Person()


def use_factory():
    p = make_person()
    return p.greet()
