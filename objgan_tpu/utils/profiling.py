"""Profiling/tracing harness (SURVEY.md §5 "Tracing/profiling" — the
reference has none; this is the TPU-native replacement).

Two tools:
  * :func:`trace` — context manager wrapping ``jax.profiler`` so any region
    dumps a TensorBoard-loadable trace (xplane) for op-level analysis.
  * :class:`StepTimer` — lightweight wall-clock step timing with
    ``block_until_ready`` fencing, percentile summary for bench harnesses.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'):`` — view with TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self, result_holder: list | None = None):
        """Time a step. Put the step's device output(s) into
        ``result_holder`` inside the block and they are fenced with
        ``block_until_ready`` before the clock stops; without a holder the
        recorded time is only the async dispatch (JAX returns before the
        device finishes), which is exactly the misleading number CLAUDE.md
        warns about."""
        t0 = time.perf_counter()
        yield
        if result_holder:
            jax.block_until_ready(result_holder)
        self.times.append(time.perf_counter() - t0)

    def timed(self, fn, *args, warmup: int = 2, iters: int = 10):
        """Time a jitted fn with proper device fencing; returns last result."""
        out = None
        for _ in range(warmup):
            out = fn(*args)
            jax.block_until_ready(out)
        self.times.clear()
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            self.times.append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, float]:
        a = np.asarray(self.times)
        if a.size == 0:
            return {}
        return {
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p95_ms": float(np.percentile(a, 95) * 1e3),
            "min_ms": float(a.min() * 1e3),
        }
