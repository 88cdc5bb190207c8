"""Tracing / profiling subsystem.

The reference has none (SURVEY §5.1 — only tqdm bars and shape prints).
Here: named phase timers + optional jax.profiler trace capture, wired into
the orchestrator so every run can report per-phase wall time and device
step time.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict
from pathlib import Path
from typing import Optional

import jax


class PhaseTimers:
    """Accumulating named wall-clock timers with JSON export.

    Thread-safe: the orchestrator times phases from the main loop, the
    prefetch worker, and the checkpoint worker concurrently."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def phase(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                with self._lock:
                    self.totals[name] += dt
                    self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in sorted(self.totals)
        }

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) when a dir is given."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
