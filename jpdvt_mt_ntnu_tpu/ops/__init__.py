from . import assignment, attention, flash_attention, jigsaw  # noqa: F401
