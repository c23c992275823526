"""Tracing / profiling utilities (SURVEY.md §5: the reference has none;
first-class here).

* `StageTimer` — blocking per-stage wall timers (used by `bench.py
  --profile`) with summary statistics.
* `device_trace` — context manager around `jax.profiler` emitting an XPlane
  trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax
import numpy as np


class StageTimer:
    """Wrap callables; each call blocks until device-ready and records wall
    time under a stage name."""

    def __init__(self):
        self.times: dict[str, list[float]] = defaultdict(list)

    def wrap(self, name: str, fn):
        def inner(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            self.times[name].append(time.perf_counter() - t0)
            return out

        return inner

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.times[name].append(time.perf_counter() - t0)

    def summary(self, skip_first: int = 1) -> dict[str, dict[str, float]]:
        out = {}
        for name, vals in self.times.items():
            tail = vals[skip_first:] or vals
            out[name] = {
                "n": len(vals),
                "first_ms": round(vals[0] * 1e3, 2),
                "median_ms": round(float(np.median(tail)) * 1e3, 2),
                "p90_ms": round(float(np.percentile(tail, 90)) * 1e3, 2),
                "total_s": round(float(np.sum(vals)), 3),
            }
        return out


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile: `with device_trace('/tmp/trace'): ...`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
