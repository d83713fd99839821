from folder1 import add_numbers
import folder1.file2

GLOBAL_TOTAL = 0


def main():
    r = add_numbers(1, 2)
    p = folder1.file2.Person()
    return r


def helper(v):
    return v + GLOBAL_TOTAL
