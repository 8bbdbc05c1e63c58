"""Profiling / tracing hooks (aux subsystem the reference lacks — SURVEY §5).

- ``trace(path)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
- ``StepTimer``: lightweight wall-clock step timing with percentile summary —
  clouds/sec/chip is the framework's first-class metric.
- ``annotate``: named trace region (shows up in the profiler timeline).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self):
        self._durations: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._durations.append(time.perf_counter() - self._t0)
        return False

    @property
    def count(self) -> int:
        return len(self._durations)

    def summary(self, items_per_step: float = 1.0) -> dict[str, float]:
        """p50/p90/mean step latency and items/sec throughput."""
        if not self._durations:
            return {}
        d = np.asarray(self._durations)
        return {
            "steps": float(len(d)),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "items_per_s": float(items_per_step / d.mean()),
        }
