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


def init_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache for every CLI.

    Remote TPU compiles in this deployment are high-variance (2-12 min);
    caching compiled executables on disk makes re-runs of the same program
    (bench sweeps, resumed training, repeated evals) start in seconds.
    Override the location with $JPDVT_COMPILE_CACHE; best-effort — backends
    that cannot serialize executables simply skip the cache.

    Deliberately NOT enabled for the CPU backend: its compiles are cheap,
    and reloading XLA:CPU AOT cache entries emits multi-KB
    feature-mismatch error lines per load (the compiler records tuning
    flags like +prefer-no-scatter in the feature string, then warns they
    are "not supported on the host"), which floods subprocess pipes.
    """
    import jax

    # Decide CPU-ness WITHOUT initializing the backend — this runs before
    # jax.distributed.initialize() in the CLIs, and jax.default_backend()
    # would lock the process into single-host mode. The platforms config
    # is already resolved by ensure_platform()/sitecustomize by now.
    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms.startswith("cpu"):
        return
    if not platforms and "JPDVT_COMPILE_CACHE" not in os.environ:
        # Unset platforms (bare dev box): the backend would resolve to
        # CPU, re-triggering the warning flood above. Opt in explicitly
        # via $JPDVT_COMPILE_CACHE on such machines.
        return
    path = path or os.environ.get(
        "JPDVT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jpdvt_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


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
