"""Profiling / step-timing utilities.

The reference's only performance instrumentation is wall-clock timing around
whole training runs (``point_density_effect.py:155-163``). Here profiling is
first-class: ``jax.profiler`` trace capture (viewable in TensorBoard /
Perfetto) and a per-step timer that feeds the clouds/sec north-star metric.

NOTE (this environment): the axon backend dispatches asynchronously and
``block_until_ready`` can return early; ``hard_sync`` forces a real host
transfer, which is the only reliable barrier. Timings should bracket with it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


def hard_sync(x) -> None:
    """Force execution to finish by pulling one scalar to host."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times and derives throughput."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            hard_sync(sync_on)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(self.times),
            "mean_ms": float(t.mean() * 1000),
            "p50_ms": float(np.percentile(t, 50) * 1000),
            "p95_ms": float(np.percentile(t, 95) * 1000),
            "items_per_sec": float(items_per_step / t.mean()),
        }
