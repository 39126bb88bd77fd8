"""Tracing and per-step timing.

The reference's only observability is wall-clock prints (main.py:69-72,
MIND_dataset.py:27-29). This module makes profiling a real subsystem:

  * `StepTimer` — cheap per-step timing with mean/median/p95 summaries,
    suitable for steady-state throughput reporting;
  * `trace` — context manager around jax.profiler for XLA/TPU traces
    viewable in TensorBoard/Perfetto (set Config.profile_dir);
  * `annotate` — named TraceAnnotation spans that show up inside device
    traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


class StepTimer:
    """Collects per-step durations; skips the first `warmup` steps (compile)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.durations: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._seen += 1
        if self._seen > self.warmup:
            self.durations.append(dt)

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        if not self.durations:
            return {"steps": 0}
        d = np.asarray(self.durations)
        return {
            "steps": int(len(d)),
            "mean_ms": float(d.mean() * 1e3),
            "median_ms": float(np.median(d) * 1e3),
            "p95_ms": float(np.percentile(d, 95) * 1e3),
            "steps_per_s": float(1.0 / d.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when `log_dir` is set; no-op otherwise."""
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
    """Named span appearing in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
