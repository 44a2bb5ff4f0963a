"""Timing + device profiling.

TicToc: the reference's manual wall-clock stopwatch (reference:
src/utils/tic_toc.h). trace(): context manager around jax.profiler for
per-kernel TPU traces (the xprof replacement for the reference's ROS_DEBUG
timing prints, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class TicToc:
    def __init__(self):
        self.tic()

    def tic(self):
        self.t0 = time.perf_counter()

    def toc(self) -> float:
        """Milliseconds since tic()."""
        return (time.perf_counter() - self.t0) * 1000.0


class Timers:
    """Named cumulative timers (replacement for the scattered sum_t /
    printStatistics counters, visualization.cpp:109-118)."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def summary(self) -> dict:
        return {k: dict(total_s=self.total[k], count=self.count[k],
                        mean_ms=1000.0 * self.total[k] / max(self.count[k], 1))
                for k in self.total}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in xprof/tensorboard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
