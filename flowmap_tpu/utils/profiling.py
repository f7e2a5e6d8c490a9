"""Profiling helpers: phase timers + jax.profiler traces.

The reference's only timing is coarse wall-clock into `runtime.json`
(`flowmap/overfit.py:45,75,134-141`). This module keeps that contract and
adds TPU-native tracing: `trace(path)` captures a TensorBoard-compatible
profile of the enclosed steps, and `PhaseTimer` accumulates named phase
durations for the runtime report.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


class PhaseTimer:
    def __init__(self) -> None:
        self.durations: dict[str, float] = {}
        self._start = time.time()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.durations[name] = self.durations.get(name, 0.0) + time.time() - t0

    @property
    def total(self) -> float:
        return time.time() - self._start

    def report(self) -> dict:
        return {"runtime": self.total, **self.durations}

    def save(self, path: Path) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: Path | str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
