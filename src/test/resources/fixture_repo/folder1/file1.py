GLOBAL_RATE = 3


class Base:
    kind = "base"

    def __init__(self):
        self.count = 0

    def increment(self):
        self.count += 1
        return self.count


def add_numbers(a, b):
    return a + b + GLOBAL_RATE
