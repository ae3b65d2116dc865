"""Tracing / profiling instrumentation.

The reference has no profiler hooks at all (SURVEY.md §5.1); on TPU the
performance story is first-class, so the framework ships:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XPlane trace of device + host activity,
* ``annotate(name)`` — named TraceAnnotation for host-side phases (data
  loading, collation) so they show up on the trace timeline,
* ``StepTimer`` — lightweight wall-clock stats (mean/p50/p95) the Trainer
  logs per epoch,
* ``device_memory_stats()`` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, with_host: bool = True):
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, capacity: int = 1000) -> None:
        self.capacity = capacity
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self.samples.append(time.perf_counter() - self._t0)
            self._t0 = None
            if len(self.samples) > self.capacity:
                self.samples = self.samples[-self.capacity :]

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "mean_ms": 1e3 * sum(s) / n,
            "p50_ms": 1e3 * s[n // 2],
            "p95_ms": 1e3 * s[min(int(0.95 * n), n - 1)],
            "count": n,
        }

    def reset(self) -> None:
        self.samples = []


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.local_devices():
        try:
            m = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gb": m.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gb": m.get("peak_bytes_in_use", 0) / 2**30,
                "limit_gb": m.get("bytes_limit", 0) / 2**30,
            }
        except Exception:
            out[str(d)] = {}
    return out
