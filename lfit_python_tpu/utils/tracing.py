"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference has no profiling beyond ad-hoc prints [R]; here the sampler
and kernels are annotated with ``jax.profiler`` traces so a run can be
inspected in TensorBoard/Perfetto, and a lightweight step-rate meter feeds
the structured metrics stream (the north-star metric is ln-like
evals/sec/chip, BASELINE.json).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace_to", "annotate", "StepMeter"]


@contextlib.contextmanager
def trace_to(logdir):
    """Capture a device trace for the enclosed block.

    View with TensorBoard's profile plugin or Perfetto (the trace lands
    under ``<logdir>/plugins/profile``).
    """
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace annotation; usable as context manager or decorator."""
    return jax.profiler.TraceAnnotation(name)


class StepMeter:
    """Windowed sampler-step rate and ln-prob-eval rate meter."""

    def __init__(self, n_walkers, window=50):
        self.n_walkers = n_walkers
        self.window = window
        self._t = []
        self._s = []

    def tick(self, step):
        self._t.append(time.perf_counter())
        self._s.append(step)
        if len(self._t) > self.window:
            self._t.pop(0)
            self._s.pop(0)

    @property
    def steps_per_sec(self):
        if len(self._t) < 2:
            return float("nan")
        dt = self._t[-1] - self._t[0]
        return (self._s[-1] - self._s[0]) / dt if dt > 0 else float("nan")

    @property
    def evals_per_sec(self):
        # one full step = one ln-prob evaluation per walker
        return self.steps_per_sec * self.n_walkers
