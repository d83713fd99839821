from folder1 import *


class Consumer:
    def consume(self):
        self.total = add_numbers(1, 2)
        return self.total
