"""Tracing/profiling hooks.

The reference logs coarse per-phase wall-clock meters (train_mr.py:36-49,
basic_utils.py:133-158) and has no device profiler; here the same phase
meters are paired with optional XLA/TPU profiler traces viewable in
TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional


class Meter:
    """Running average/min/max of a scalar series."""

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self.min = float("inf")
        self.max = float("-inf")

    def update(self, value: float):
        self.count += 1
        self.total += value
        self.min = min(self.min, value)
        self.max = max(self.max, value)

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)

    def summary(self) -> dict:
        return {"avg": self.avg, "min": self.min, "max": self.max, "n": self.count}


class PhaseTimers:
    """Named phase timers: `with timers.phase("forward"): ...`."""

    def __init__(self):
        self.meters = defaultdict(Meter)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.meters[name].update(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {k: m.summary() for k, m in self.meters.items()}


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """XLA profiler trace around a region; no-op when log_dir is None.
    View with TensorBoard's profile plugin / XProf."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
