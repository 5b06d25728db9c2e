"""Profiling helpers (the reference has none beyond wall-clock prints,
SURVEY.md §5 — this is framework-side tooling the rebuild adds).

``trace(logdir)`` wraps jax.profiler for TensorBoard-viewable device traces;
``timeit`` is the wall-clock fallback that works through async runtimes by
forcing a device fetch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call; forces completion by fetching a scalar
    (block_until_ready alone can return early through async relays)."""
    def run():
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
