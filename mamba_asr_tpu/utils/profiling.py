"""Profiling and tracing: jax.profiler hooks + step-time/RTFx meters.

The reference has no in-repo profiling (SURVEY.md §5.1 — docs suggest
nvidia-smi monitoring only); this framework makes tracing first-class:

- `profile_trace(logdir)`: context manager around jax.profiler.trace —
  produces a TensorBoard-compatible device trace (XLA ops, fusions, HBM).
- `StepTimer`: running mean/percentile step-time meter with warmup skip.
- `rtfx(audio_seconds, wall_seconds)`: the real-time-factor-X metric
  (audio seconds processed per wall second) used by bench.py and
  BASELINE.json.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, with_memory: bool = True) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Step-time meter; call mark() after each blocking step."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._last: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._last = time.perf_counter()

    def mark(self) -> float:
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def percentile(self, p: float) -> float:
        if not self.times:
            return 0.0
        s = sorted(self.times)
        idx = min(int(len(s) * p / 100.0), len(s) - 1)
        return s[idx]

    def summary(self) -> dict:
        return {
            "steps": len(self.times),
            "mean_s": self.mean(),
            "p50_s": self.percentile(50),
            "p95_s": self.percentile(95),
        }


def rtfx(audio_seconds: float, wall_seconds: float) -> float:
    """Audio seconds processed per wall-clock second (higher is better);
    RTFx == 1/RTF."""
    return audio_seconds / max(wall_seconds, 1e-9)
