"""Tracing / profiling utilities.

First-class replacement for the reference's ad-hoc tick/tock Timer
(/root/reference/src/tracker/tracking_utils.py:5-46), plus a jax.profiler
trace context for TPU timeline capture (view with TensorBoard or xprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    """Named tick/tock accumulator with mean/total reporting."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._starts: Dict[str, float] = {}

    def tick(self, name: str = "default"):
        self._starts[name] = time.perf_counter()

    def tock(self, name: str = "default") -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    @contextlib.contextmanager
    def scope(self, name: str):
        self.tick(name)
        try:
            yield
        finally:
            self.tock(name)

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name]
                / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self):
        for name, s in sorted(self.summary().items()):
            print(f"[timer] {name}: {s['mean_ms']:.2f} ms x {s['count']} "
                  f"(total {s['total_s']:.2f}s)")


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context. Produces a TPU timeline under
    ``log_dir`` when enabled."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, fetch=True, **kwargs):
    """Time one call with forced completion (host fetch — see BASELINE.md:
    block_until_ready returns early on the tunneled TPU backend)."""
    import numpy as np

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if fetch:
        import jax

        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
    return time.perf_counter() - t0, out
