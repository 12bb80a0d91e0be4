"""Profiling and throughput instrumentation.

The reference has no tracing/profiling beyond wall-clock prints (SURVEY §5).
Here: a jax.profiler trace context manager, a step timer with proper
``block_until_ready`` semantics, and the edges/sec meter that is this
framework's north-star counter (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates device-synchronized step timings and real edge counts."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._times: list = []
        self._edges: list = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None, num_real_edges: int = 0) -> float:
        """Stop timing (blocking on ``result`` if given); returns seconds."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        self._edges.append(num_real_edges)
        return dt

    @property
    def steps(self) -> int:
        return len(self._times)

    def summary(self, skip_warmup: int = 1) -> dict:
        t = np.array(self._times[skip_warmup:] or self._times)
        e = np.array(self._edges[skip_warmup:] or self._edges)
        total_t = float(t.sum()) if len(t) else 0.0
        return {
            "steps": int(len(t)),
            "mean_step_ms": float(t.mean() * 1e3) if len(t) else 0.0,
            "p50_step_ms": float(np.percentile(t, 50) * 1e3) if len(t) else 0.0,
            "edges_per_sec": float(e.sum() / total_t) if total_t > 0 else 0.0,
        }
