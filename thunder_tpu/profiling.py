"""Profiling & step timing.

The reference has no tracing subsystem (SURVEY.md §5.1); this module adds the
TPU-native one: ``jax.profiler`` traces viewable in XProf/TensorBoard, plus a
lightweight step timer with RTF accounting for ASR workloads.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block (XProf format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Wall-clock step statistics + real-time factor for audio workloads."""

    sample_rate: int = 16000
    times: List[float] = field(default_factory=list)
    audio_samples: List[int] = field(default_factory=list)
    _start: Optional[float] = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self, batch_audio_samples: int = 0):
        if self._start is None:
            raise RuntimeError("StepTimer.stop() without start()")
        self.times.append(time.perf_counter() - self._start)
        self.audio_samples.append(batch_audio_samples)
        self._start = None

    @contextlib.contextmanager
    def step(self, batch_audio_samples: int = 0):
        self.start()
        try:
            yield
        finally:
            self.stop(batch_audio_samples)

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        times = self.times[skip_warmup:] or self.times
        samples = self.audio_samples[skip_warmup:] or self.audio_samples
        total = sum(times)
        out = {
            "steps": float(len(times)),
            "mean_step_s": total / max(len(times), 1),
            "steps_per_sec": len(times) / total if total else 0.0,
        }
        if any(samples):
            audio_sec = sum(samples) / self.sample_rate
            out["rtf"] = audio_sec / total if total else 0.0
        return out
