"""Tracing / profiling / per-frame stats (SURVEY.md §5).

The reference's only instrumentation is a 1 Hz FPS title-bar counter
(src/main.cpp:438-458). Here:
  * `FrameTimer` — named wall-clock stages with a one-line report;
  * `march_stats` — per-frame ray outcome counts (captured / escaped /
    step-cap saturated) from the march state;
  * `trace` — context manager around `jax.profiler.trace` for XLA-level
    traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


class FrameTimer:
    """Accumulates named stage timings; thread-unsafe by design (per loop)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        parts = []
        for name, total in sorted(self.totals.items()):
            n = max(1, self.counts[name])
            parts.append(f"{name}: {total / n * 1000:.2f} ms/it (n={n})")
        return " | ".join(parts) if parts else "(no stages timed)"

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


def march_stats(state) -> Dict[str, float]:
    """Ray-outcome summary from a MarchState: fraction captured by the
    horizon, escaped to infinity, and still active at the step cap (the
    rays that paid for MAX_STEPS; the early-exit win shrinks with this)."""
    hit = np.asarray(state.hit_horizon)
    active = np.asarray(state.active)
    n = hit.size
    captured = float(hit.sum()) / n
    saturated = float(active.sum()) / n
    return {
        "rays": n,
        "captured": captured,
        "saturated": saturated,
        "escaped": 1.0 - captured - saturated,
        "mean_transmittance": float(np.asarray(state.transmittance).mean()),
    }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """XLA profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
