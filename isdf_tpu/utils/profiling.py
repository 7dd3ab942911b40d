"""Profiling / tracing hooks (reference had only CUDA-event step timing,
metrics.py:13-38; here: jax.profiler traces + rolling step-time stats)."""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Dict


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/isdf_tpu_trace"):
    """jax.profiler trace context; open the dir with TensorBoard/xprof.
    (On tunneled backends tracing may be unsupported — the context then
    degrades to a no-op with a warning.)"""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield log_dir
    except Exception as e:  # pragma: no cover
        print(f"profiler unavailable ({e!r}); continuing without trace")
        yield None


class StepTimer:
    """Rolling window of per-bundle timings, like the reference GUI's
    20-second compute-balance readout (isdf_window.py:694-708)."""

    def __init__(self, window_s: float = 20.0):
        self.window_s = window_s
        self.events: Deque = deque()

    def add(self, kind: str, seconds: float, steps: int = 0):
        now = time.perf_counter()
        self.events.append((now, kind, seconds, steps))
        cutoff = now - self.window_s
        while self.events and self.events[0][0] < cutoff:
            self.events.popleft()

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        steps = 0
        for _, kind, sec, st in self.events:
            out[kind] = out.get(kind, 0.0) + sec
            steps += st
        total = sum(out.values())
        if total > 0:
            out["steps_per_sec"] = steps / total
        return out
