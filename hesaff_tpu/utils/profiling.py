"""Tracing / profiling (SURVEY.md §5).

The reference has a single CPU-clock timer around detection
(/root/reference/helpers.cpp:23-38, hesaff.cpp:166-168).  Here:

  * `stage(name)` — context manager timing a pipeline stage with a
    device sync (block_until_ready on the stage's outputs is the
    caller's job; the sync here bounds async dispatch);
  * integrates with jax.profiler: inside `trace_to(logdir)` every stage
    also emits a TraceAnnotation visible in xprof/tensorboard;
  * `StageTimes.report()` — per-stage wall ms + derived kp/s rates.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimes:
    """Accumulates per-stage wall times across calls."""

    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            dt = time.perf_counter() - t0
        self.times[name] += dt
        self.counts[name] += 1

    def report(self, items_per_stage: dict | None = None) -> str:
        lines = []
        for name in sorted(self.times, key=self.times.get, reverse=True):
            line = (f"{name:24s} {self.times[name]*1e3:9.1f} ms "
                    f"({self.counts[name]}x)")
            if items_per_stage and name in items_per_stage:
                rate = items_per_stage[name] / max(self.times[name], 1e-9)
                line += f"  {rate:,.0f}/s"
            lines.append(line)
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context (xprof-compatible TensorBoard logs)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
