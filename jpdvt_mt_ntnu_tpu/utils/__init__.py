from . import pos_embed  # noqa: F401
