"""Tracing/profiling helpers (SURVEY.md section 5.1 TPU plan).

The reference had only ad-hoc py-spy sampling and hand timing; here the
first-class story is ``jax.profiler`` device traces plus step-time and
device-memory introspection.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ("trace", "StepTimer", "device_memory_stats")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timer with steps/s accounting."""

    def __init__(self, window: int = 20):
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def steps_per_sec(self, steps_per_iter: int) -> float:
        return steps_per_iter / self.mean if self.times else float("nan")


def device_memory_stats(device=None) -> dict:
    """Live device memory stats (bytes), when the backend reports them."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return stats or {}
