"""Tracing and step timing.

The reference's only observability is wall-clock steps/sec behind a
``torch.cuda.synchronize`` fence (reference: image_model/train_JPDVT.py:379-391)
and per-image CSV timings (SURVEY.md §5.1). This module provides the
TPU-native equivalents: XLA profiler trace capture (viewable in
TensorBoard/Perfetto) and correctly-fenced step timing via
``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace: ``with trace("prof/"): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Windowed steps/sec + device fencing (the cuda.synchronize analogue)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()
        self._steps = 0

    def step(self, fence: Any = None) -> None:
        """Count one step; pass a device array to fence on its readiness."""
        if fence is not None:
            jax.block_until_ready(fence)
        self._steps += 1

    def rate(self, reset: bool = True) -> float:
        dt = time.perf_counter() - self._start
        rate = self._steps / dt if dt > 0 else 0.0
        if reset:
            self.reset()
        return rate


def measure(fn: Callable, *args, iters: int = 5,
            warmup: int = 1) -> dict[str, float]:
    """Compile-vs-steady timing of a jitted callable.

    Returns {"compile_s": first-call time, "steady_s": mean of ``iters``
    fenced calls, "per_sec": 1/steady_s}.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t1) / iters
    return {"compile_s": compile_s, "steady_s": steady,
            "per_sec": (1.0 / steady) if steady > 0 else float("inf")}
