from .dit import (  # noqa: F401
    DiT,
    DiTConfig,
    DIT_CONFIGS,
    create_model,
)
