"""Tracing / profiling / observability.

The reference has none of this (SURVEY.md §5: tqdm bars only); it's a required
addition for validating the perf targets. Provides:
  - StageTimer: wall-clock per pipeline stage with a printed summary;
  - trace(): context manager around jax.profiler for TensorBoard traces;
  - debug_nans(): scoped jax NaN-checking (the purity-era analog of the
    reference's nonexistent sanitizers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple


class StageTimer:
    """Accumulates named stage durations.

    with timer.stage("dust3r"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.records: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.records.append((name, time.time() - t0))

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self.records:
            out[name] = out.get(name, 0.0) + dt
        return out

    def summary(self) -> str:
        totals = self.totals()
        total = sum(totals.values())
        lines = [f"{'stage':<24}{'sec':>9}{'%':>7}"]
        for name, dt in sorted(totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * dt / total if total else 0.0
            lines.append(f"{name:<24}{dt:>9.2f}{pct:>6.1f}%")
        lines.append(f"{'total':<24}{total:>9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/viewcrafter_trace"):
    """jax.profiler trace for TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
