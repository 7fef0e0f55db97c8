"""Profiling & tracing: first-class jax.profiler integration.

The reference has no systematic profiling (SURVEY.md §5 — TensorBoard only
via Lightning); here tracing is built in: wrap any region in `trace()` to
capture a TensorBoard/Perfetto trace, time jitted steps with `StepTimer`
(device-synchronized), and `profile_fn` one-shots a compiled function.
The training loop exposes these via the train CLI `--profile-dir` flag.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device synchronization and percentiles."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Blocks on `result` (pytree of arrays) before stopping the clock."""
        if result is not None:
            for leaf in jax.tree_util.tree_leaves(result):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return dict(
            mean_ms=float(a.mean() * 1e3),
            p50_ms=float(np.percentile(a, 50) * 1e3),
            p95_ms=float(np.percentile(a, 95) * 1e3),
            steps=len(a),
        )


def profile_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2, log_dir: Optional[str] = None) -> dict:
    """Time a jitted function; optionally capture a trace of one iteration."""
    for _ in range(warmup):
        out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    timer = StepTimer()
    for _ in range(iters):
        timer.start()
        timer.stop(fn(*args))
    if log_dir:
        with trace(log_dir):
            fn(*args)
    return timer.summary()
