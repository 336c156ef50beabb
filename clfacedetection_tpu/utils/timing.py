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
    """Steady-state milliseconds per call of a jitted function.

    Measures by enqueueing ``iters`` calls and **reading every output back
    to the host** at the end: on tunneled platforms (axon)
    ``jax.block_until_ready`` does not reliably synchronize — a call can
    "block" in microseconds while the device work takes tens of
    milliseconds — so device-to-host materialization is the only barrier
    that measures real execution.  The per-iteration readback/sync latency
    (~24 ms through the tunnel) is amortized by keeping all ``iters``
    results live and reading them after the clock stops... which would
    mis-amortize the readback itself; instead every result is read inside
    the timed window and the first is read before it, so steady-state
    cost = (readback-synced wall time) / iters.
    """
    import jax
    import numpy as np

    def read(o):
        return jax.tree_util.tree_map(np.asarray, o)

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    read(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        out = read(o)
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
