from .service import PuzzleService, ServiceConfig  # noqa: F401
