"""Profiling / tracing utilities.

The reference's observability is hand-rolled `time.perf_counter()` spans with
a rolling mean + ETA (reference bin/train.py:59,199-254, hparams.py:40).
This module provides that (`StepTimer`) plus the TPU-native upgrade the
reference lacks: `jax.profiler` trace capture (`trace` context manager /
`start_trace`), viewable in TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class StepTimer:
    """Rolling step-time window with ETA (reference time_list semantics:
    compaction every `clear_time` entries, bin/train.py:250-254)."""

    clear_time: int = 20
    window: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.window.append(dt)
        if len(self.window) > self.clear_time:
            # keep the mean as one entry (reference compaction)
            self.window = [sum(self.window) / len(self.window)]
        return dt

    @property
    def mean(self) -> float:
        return sum(self.window) / len(self.window) if self.window else 0.0

    def eta_seconds(self, current_step: int, total_step: int) -> float:
        return max(0, total_step - current_step) * self.mean


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block.

    View with `tensorboard --logdir <logdir>` (profile plugin) or upload the
    .trace.json.gz to Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
