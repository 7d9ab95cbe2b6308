"""Platform selection that survives environment quirks.

Some execution images register a custom JAX backend from ``sitecustomize``
and force-set ``jax.config.jax_platforms`` at interpreter start, which
silently overrides the ``JAX_PLATFORMS`` environment variable. Every CLI in
this framework calls :func:`ensure_platform` first so the env var wins
again (required for CPU smoke runs and the virtual-device test mesh).
"""

from __future__ import annotations

import os


def apply_matmul_precision(precision: str | None) -> None:
    """Set the global default matmul precision ("highest" for parity runs)."""
    if not precision:
        return
    import jax

    jax.config.update("jax_default_matmul_precision", precision)


def ensure_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass
