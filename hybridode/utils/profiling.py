"""Profiling: phase timers + jax.profiler trace capture.

The reference records only end-to-end wall-clock via time.time()
(training_utils.py:30, 82-94). Here: named phase timers that aggregate
across iterations (data, step, eval) and a one-liner to capture a
TensorBoard-compatible device trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; report() prints a summary."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            tot, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: total={tot:.3f}s n={n} mean={tot / max(n, 1) * 1e3:.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
