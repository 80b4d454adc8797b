"""Tracing / throughput instrumentation.

The reference has no profiling beyond tqdm bars (trainer.py:136). Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution;
- ``StepTimer``: wall-clock step timing with warmup skip, reporting p50 and
  throughput in user units (e.g. measures/sec — the north-star metric).
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_event_durations(
    logdir: str, match: str, line_match: Optional[str] = None
) -> List[float]:
    """Durations (ms) of DEVICE-plane events whose name contains ``match``
    in a ``trace(logdir)`` capture, sorted ascending.

    This is the direct on-device step-time measurement: host wall-clock
    through a tunneled TPU is RTT-bound (docs/PERFORMANCE.md landmines),
    but the device plane of the profiler trace records actual execution
    spans of each launched executable.

    ``line_match`` restricts to plane lines whose name contains it (e.g.
    ``"XLA Modules"`` for whole-executable spans) — without it, profiler
    versions that prefix sub-op events with the module name would mix
    per-op spans into the population."""
    import glob
    import os

    from jax.profiler import ProfileData

    out: List[float] = []
    for path in glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    ):
        data = ProfileData.from_file(path)
        for plane in data.planes:
            # device planes are named like "/device:TPU:0"; skip host planes
            if "/device:" not in plane.name:
                continue
            for line in plane.lines:
                if line_match is not None and line_match not in line.name:
                    continue
                for ev in line.events:
                    if match in ev.name:
                        out.append(ev.duration_ns / 1e6)
    return sorted(out)


class StepTimer:
    def __init__(self, items_per_step: float = 1.0, warmup: int = 1):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return False

    @property
    def p50_ms(self) -> float:
        if not self._times:
            return float("nan")
        return sorted(self._times)[len(self._times) // 2] * 1e3

    @property
    def mean_s(self) -> float:
        if not self._times:
            return float("nan")
        return sum(self._times) / len(self._times)

    @property
    def throughput(self) -> float:
        m = self.mean_s
        return self.items_per_step / m if m > 0 else float("nan")

    def report(self, unit: str = "items") -> str:
        return (
            f"p50 {self.p50_ms:.2f} ms/step, "
            f"{self.throughput:.1f} {unit}/s over {len(self._times)} steps"
        )
