"""Profiling / timing utilities.

The reference has no tracing at all — only wall-clock aggregates (SURVEY.md
§5): per-frame SR time at inference (main.py:256-260,270) and images/sec +
ETA at training (main.py:404-411). This module provides both of those plus
real traces:

- :func:`trace`: context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace (xplane) directory.
- :class:`StepTimer`: robust step timing that syncs through a dependent
  scalar fetch — ``block_until_ready`` alone is unreliable on tunneled
  backends.
- :func:`device_time`: time a jitted callable's steady state.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"):`` — jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force completion of everything ``x`` depends on; returns the scalar."""
    return float(np.asarray(jax.device_get(jnp.sum(
        jax.tree.leaves(x)[0].astype(jnp.float32)
        if jax.tree.leaves(x) else jnp.zeros(())
    ))))


class StepTimer:
    """Images/sec + ETA tracking (reference main.py:404-411 semantics)."""

    def __init__(self, items_per_step: float, total_steps: Optional[int] = None):
        self.items_per_step = items_per_step
        self.total_steps = total_steps
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self.items_per_step * self._steps / dt if dt > 0 else 0.0

    def eta_hours(self, current_step: int) -> Optional[float]:
        if not self.total_steps or self._steps == 0:
            return None
        dt = time.perf_counter() - self._t0
        per_step = dt / self._steps
        return (self.total_steps - current_step) * per_step / 3600.0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0


def device_time_samples(fn: Callable, *args, iters: int = 10,
                        warmup: int = 2, passes: int = 1) -> list:
    """``passes`` synced measurements of ``iters`` calls each; one
    seconds-per-call sample per pass (median/min/max across passes is the
    run-to-run spread a single number hides)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    samples = []
    for _ in range(max(1, passes)):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        samples.append((time.perf_counter() - t0) / iters)
    return samples


def device_time(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds per call of a jitted ``fn`` (sync via fetch)."""
    return device_time_samples(fn, *args, iters=iters, warmup=warmup)[0]
