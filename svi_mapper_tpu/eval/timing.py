"""Per-stage timing instrumentation and end-of-run reports.

Replaces the reference's manual wall-clock accumulators and exit report
(``CTimer`` CTimer.h:14-29; per-stage buckets in CFundamentalMatcher.h:100-106
and CSolverStereoPosit.h:101; the printed time budget tracker_gt.cpp:285-308
with avg fps and "x real time" at the assumed 20 fps dataset rate).

Under jit the per-frame stages fuse into one XLA program, so per-stage
wall-clock splitting requires either jax.profiler traces (exposed via
:func:`trace`) or running stages as separate jitted calls
(:class:`StageTimer`, used by benchmarks/diagnostics, not the hot path).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

DATASET_FPS = 20.0   # the reference's real-time definition (tracker_gt.cpp:275)


class StageTimer:
    """Accumulating wall-clock buckets (the CTimer + bucket pattern)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self, n_frames: int, wall_seconds: float) -> str:
        """The end-of-run time budget (format of tracker_gt.cpp:285-308)."""
        lines = [
            "-" * 64,
            f"frames: {n_frames}   wall: {wall_seconds:.2f} s   "
            f"avg fps: {n_frames / max(wall_seconds, 1e-9):.2f}   "
            f"x real time: {(n_frames / DATASET_FPS) / max(wall_seconds, 1e-9):.2f}",
            "-" * 64,
        ]
        total_tracked = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            share = t / max(wall_seconds, 1e-9) * 100.0
            lines.append(
                f"  {name:<28s} {t:8.3f} s  ({share:5.1f} %)  x{self.counts[name]}"
            )
        lines.append(f"  {'(untracked)':<28s} {max(wall_seconds - total_tracked, 0.0):8.3f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/svi_mapper_tpu_trace"):
    """jax.profiler trace wrapper — open the result with TensorBoard or
    Perfetto for the true on-device stage breakdown."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
