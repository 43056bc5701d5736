"""Profiling hooks (reference has none — SURVEY §5 'Tracing/profiling: none';
only wall-clock meters). Here: jax.profiler integration for step-window traces
plus a simple step timer with device-sync."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace_window", "StepTimer", "maybe_trace_step"]


@contextlib.contextmanager
def trace_window(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock per-step timing with an optional profiler window
    [start_step, start_step + num_steps)."""

    def __init__(self, log_dir: Optional[str] = None, start_step: int = -1,
                 num_steps: int = 0):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self._t0 = None

    def step_begin(self, step: int):
        if (self.log_dir and step == self.start_step and not self._active):
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        self._t0 = time.perf_counter()

    def step_end(self, step: int, sync_value=None) -> float:
        if sync_value is not None:
            # value fetch is the reliable device sync (see bench.py note)
            float(jax.numpy.ravel(sync_value)[0])
        dt = time.perf_counter() - self._t0
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
        return dt


@contextlib.contextmanager
def maybe_trace_step(log_dir: Optional[str], enabled: bool):
    if not (log_dir and enabled):
        yield
        return
    with trace_window(log_dir):
        yield
