"""Profiling / tracing helpers.

The reference had no tracing subsystem (SURVEY.md §5); on TPU we expose the JAX
profiler (xprof traces viewable in TensorBoard) plus a tiny step timer.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof trace: `with trace("logs/trace"): run_steps()` then open
    TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in xprof timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Moving-average step timing with imgs/sec reporting."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def avg_step_seconds(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def imgs_per_sec(self, batch_size: int) -> float:
        s = self.avg_step_seconds
        return batch_size / s if s > 0 else 0.0
