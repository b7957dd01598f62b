"""Tracing & metrics.

The reference's only observability is DEBUG printf dumps (pdmp3.c:894-965)
— here: wall-clock stage timers, counters, and an optional JAX profiler
trace for xplane/perfetto inspection (SURVEY.md §5).
"""
from __future__ import annotations

import collections
import contextlib
import time


class StageTimer:
    """Accumulating per-stage wall-clock timers + counters."""

    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def count(self, name: str, n: int = 1):
        self.counts[name] += n

    def report(self) -> dict:
        return {
            name: {"seconds": round(self.totals[name], 6),
                   "count": self.counts[name]}
            for name in sorted(set(self.totals) | set(self.counts))
        }


@contextlib.contextmanager
def Trace(dirname: str | None = None):
    """JAX profiler trace scope; no-op when dirname is None."""
    if dirname is None:
        yield
        return
    import jax
    with jax.profiler.trace(dirname):
        yield
