from .file1 import Base


class Person(Base):
    """A person.
    Multi-line docstring."""

    def greet(self):
        self.name = "person"
        return self.increment()
