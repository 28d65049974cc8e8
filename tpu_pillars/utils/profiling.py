"""Profiling helpers (SURVEY.md section 5 'Tracing/profiling'): wall-clock
stage timers with true device sync, and a jax.profiler trace context for
TensorBoard-viewable device traces.

NOTE (axon remote backend): `block_until_ready` can return before the device
work completes; `StageTimer` therefore syncs by pulling one scalar of the
result to the host, which is the only reliable barrier there.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def _sync(tree) -> None:
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "ravel")]
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[0:1])


class StageTimer:
    """Accumulates per-stage wall time with device-synced boundaries.

    >>> timer = StageTimer()
    >>> with timer.stage("pillarize"):
    ...     out = pillarize_fn(points)      # sync happens on exit
    >>> timer.summary()   # {'pillarize': {'total_s': ..., 'count': ...}}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._result = None

    def observe(self, tree):
        """Register the stage's output so the timer can sync on it."""
        self._result = tree
        return tree

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self._result is not None:
                _sync(self._result)
                self._result = None
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(v, 6), "count": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace viewable in TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
