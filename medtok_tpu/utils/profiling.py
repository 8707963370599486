"""Tracing / profiling hooks (SURVEY.md section 5.1).

The reference's only instrumentation is wall-clock steps/sec around
torch.cuda.synchronize (train_MedTok.py:256-264). TPU-native equivalents:
- ``trace(logdir)``: a jax.profiler trace context (open in XProf/TensorBoard)
- ``StepTimer``: device-synchronized steps/sec + per-step latency stats
- ``annotate``: named TraceAnnotation spans visible in the profile.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a device trace: ``with trace('prof/'): step(...)``."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (maps to jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """steps/sec with explicit device sync at measurement boundaries (the
    jax analogue of the reference's cuda.synchronize timing)."""

    def __init__(self):
        self._times: list[float] = []
        self._t0: float | None = None

    def start(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        return dt

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / np.mean(self._times) if self._times else 0.0

    def summary(self) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps_per_sec": float(1.0 / t.mean()),
            "step_ms_mean": float(t.mean() * 1e3),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p99": float(np.percentile(t, 99) * 1e3),
        }
