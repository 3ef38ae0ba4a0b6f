"""Profiling / tracing utilities — the upgrade over the reference's
wall-clock-only instrumentation (SURVEY.md §5: EventStorage perf_counter
timings, no torch profiler, no chrome traces).

Provides: jax.profiler trace capture (TensorBoard/XProf-compatible),
annotated step timing, and a lightweight step timer with percentile stats.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard:
        with profiling.trace('output/trace'):
            train_step(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labelling regions inside a trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step timer with p50/p90/max (blocks on device completion)."""

    def __init__(self, window: int = 100):
        self.times: deque[float] = deque(maxlen=window)
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def block_and_stop(self, result):
        jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def stats(self) -> dict[str, float]:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {"p50": float(np.percentile(a, 50)),
                "p90": float(np.percentile(a, 90)),
                "max": float(a.max()),
                "mean": float(a.mean())}


def device_memory_stats() -> dict:
    """Per-device memory usage (bytes) where the backend reports it."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use"),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use")}
        except Exception:
            out[str(d)] = {}
    return out
