"""Tracing / profiling helpers.

Replaces the reference's ad-hoc ``time.time()`` bracket prints around
validation phases (running_main_v3.py:606-730) with:
  * ``phase(name)`` — context manager logging wall time per phase;
  * ``annotate(name)`` — jax.profiler TraceAnnotation visible in
    TensorBoard/XProf traces;
  * ``trace(log_dir)`` — whole-block device trace capture via
    ``jax.profiler.start_trace`` / ``stop_trace``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator


class PhaseTimer:
    """Accumulates wall-time per named phase; reference-style bracket logs."""

    def __init__(self, verbose: bool = False):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if self.verbose:
                print(f"    [{name}] {dt:.3f}s")

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device profile (no-op overhead when not tracing)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a full device trace into ``log_dir`` (view with XProf)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
