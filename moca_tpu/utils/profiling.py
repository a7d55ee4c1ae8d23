"""Tracing / profiling hooks (aux subsystem — SURVEY §5.1).

The reference has no profiling (tqdm bars + one wall-clock print,
inference.py:91,127). Here:
  * `trace(dir)` — context manager around `jax.profiler` for TensorBoard
    traces of the jitted FIFO/DDIM steps,
  * `StepTimer` — per-stage wall-clock accounting with a JSON summary,
    used by the pipelines when MOCA_TPU_PROFILE=1.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Dict, List

import jax


@contextmanager
def trace(log_dir: str = "/tmp/moca_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device traces (use around host-side calls of
    jitted functions)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock per named stage; prints one JSON line."""

    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = os.environ.get("MOCA_TPU_PROFILE", "0") == "1"
        self.enabled = enabled
        self.times: Dict[str, List[float]] = {}

    @contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            out[name] = {
                "count": len(ts),
                "total_s": round(sum(ts), 4),
                "mean_s": round(sum(ts) / len(ts), 4),
                "min_s": round(min(ts), 4),
            }
        return out

    def report(self):
        if self.enabled and self.times:
            print(json.dumps({"profile": self.summary()}))
