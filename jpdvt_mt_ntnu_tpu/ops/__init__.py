from . import assignment, attention, jigsaw  # noqa: F401
