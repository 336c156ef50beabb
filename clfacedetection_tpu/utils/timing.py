"""Timing / profiling utilities.

The reference instruments with a ``gettimeofday`` stopwatch (``ElapseTime``,
clod.h:23-36, used across main.cpp:72-96) and nothing device-side.  Here the
same stopwatch API exists for host phases, plus a device-accurate timer that
blocks on JAX async dispatch, plus a context manager around
``jax.profiler.trace`` for real TPU traces (SURVEY.md section 5 "tracing").
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional, Tuple

__all__ = ["ElapseTime", "time_jax", "profile_trace"]


class ElapseTime:
    """Stopwatch in milliseconds (API of the reference's ElapseTime)."""

    def __init__(self) -> None:
        self._s = 0.0

    def start(self) -> None:
        self._s = time.perf_counter()

    def get(self) -> float:
        return (time.perf_counter() - self._s) * 1e3


def time_jax(fn: Callable, *args, iters: int = 10,
             warmup: int = 2) -> Tuple[float, object]:
    """Steady-state milliseconds per call of a jitted function (blocks on
    async dispatch so device time is measured, not enqueue time)."""
    import jax
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/clfd_trace"):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
