"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY §5: the
``CompleteAnalysisResult.processing_time`` field exists but is never
populated, reference structures/analysis.py:142). This module provides the
TPU-native observability layer:

- :class:`StageTimer` — per-stage host wall-clock accounting for the
  processors (decode / diarize / transcribe / device / assemble)
- :func:`device_trace` — ``jax.profiler`` trace context writing a TensorBoard
  trace for the jitted graphs
- :func:`fetch_timed` — correct device timing under the axon tunnel, where
  ``block_until_ready`` returns early and only a host fetch synchronizes.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

import numpy as np

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-clock per named stage. Cheap enough to always be on."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self) -> None:
        """Zero the accumulators (e.g. between a warmup and a timed pass)."""
        self.totals.clear()
        self.counts.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in sorted(self.totals)
        }

    def log_summary(self, prefix: str = "stage timings") -> None:
        for name, s in self.summary().items():
            logger.info(
                "%s: %-12s total=%.3fs n=%d mean=%.1fms",
                prefix,
                name,
                s["total_s"],
                s["count"],
                s["mean_ms"],
            )


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace for TensorBoard (xprof). Wrap a few steady-state
    steps, not the compile."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_timed(fn, *args, fetch=lambda out: out, iters: int = 1):
    """Time ``fn(*args)`` with a true device sync: fetches ``fetch(out)`` to
    host at the end (under the axon tunnel, block_until_ready returns before
    execution finishes — host fetch is the only real barrier).
    Returns (last_output, seconds)."""
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(fetch(out))
    return out, time.perf_counter() - t0
