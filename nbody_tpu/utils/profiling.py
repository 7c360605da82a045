"""Profiling helpers: wall-clock step timing + jax.profiler traces.

The reference's only instrumentation is CLOCK_MONOTONIC wall timing in bench.c
(SURVEY.md §5). Here: the same style of timer, plus optional XLA/TPU profiler
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class StepTimer:
    """Accumulates per-call wall times of blocking device work."""

    times_s: list = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, tree_to_block=None):
        t0 = time.perf_counter()
        yield
        if tree_to_block is not None:
            jax.block_until_ready(tree_to_block)
        self.times_s.append(time.perf_counter() - t0)

    @property
    def mean_us(self) -> float:
        return 1e6 * sum(self.times_s) / max(1, len(self.times_s))

    @property
    def best_us(self) -> float:
        return 1e6 * min(self.times_s) if self.times_s else 0.0

    def summary(self) -> str:
        return f"{len(self.times_s)} calls, mean {self.mean_us:.1f} µs, best {self.best_us:.1f} µs"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nbody_tpu_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
