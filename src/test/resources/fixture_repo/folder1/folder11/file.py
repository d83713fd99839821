from ..file1 import add_numbers


def double_add(a, b):
    return add_numbers(a, b) * 2
