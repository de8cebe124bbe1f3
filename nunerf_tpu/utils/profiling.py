"""Profiling hooks: JAX profiler traces + throughput counters.

The reference has no profiling at all (SURVEY.md section 5) — only tqdm bars.
Here: ``profile_trace`` wraps a region in a TensorBoard-viewable XLA trace,
and ``StepTimer`` tracks steady-state rays/s with warmup exclusion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rays/s over a sliding window, ignoring the first (compile) steps."""

    def __init__(self, rays_per_step: int, warmup: int = 2):
        self.rays_per_step = rays_per_step
        self.warmup = warmup
        self.count = 0
        self.t0 = None
        self.steps_timed = 0

    def tick(self):
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
            self.steps_timed = 0
        elif self.count > self.warmup:
            self.steps_timed += 1

    @property
    def rays_per_sec(self) -> float:
        if not self.t0 or not self.steps_timed:
            return 0.0
        return self.steps_timed * self.rays_per_step / (
            time.perf_counter() - self.t0)
