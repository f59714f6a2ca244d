"""Tracing / profiling / numerics-debug hooks.

The reference has no profiling at all and only autograd anomaly detection
for numerics (reference train.py:17, 67; SURVEY.md §5.1-5.2). This module
provides the TPU-native equivalents:

  * `trace(logdir)` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable trace of device execution.
  * `StepTimer` — wall-clock step timing + rays/sec and points/sec
    counters for train/render loops.
  * `enable_nan_checks()` — jax debug_nans/debug_infs (the analog of
    `torch.autograd.set_detect_anomaly(True)`).
  * `check_finite(tree)` — explicit in-step finite assertion usable under
    jit via `equinox-style` error cond (returns a bool array).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's profile plugin
    or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces (python-side)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    """Re-run jit'd computations eagerly when a NaN/Inf appears and point
    at the producing primitive."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def check_finite(tree) -> jnp.ndarray:
    """All-leaves-finite predicate, usable inside jit."""
    leaves = jax.tree.leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


class StepTimer:
    """Sliding-window step timing with derived throughput counters."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_step_s
        return items_per_step / s if s == s and s > 0 else float("nan")

    def metrics(self, rays_per_step: Optional[int] = None,
                points_per_step: Optional[int] = None) -> Dict[str, float]:
        out = {"step_time_s": self.mean_step_s}
        if rays_per_step:
            out["rays_per_sec"] = self.throughput(rays_per_step)
        if points_per_step:
            out["points_per_sec"] = self.throughput(points_per_step)
        return out
