from .file1 import add_numbers, Base
