"""Profiling / tracing hooks — net-new subsystem (SURVEY.md §5: the reference
captures wall-clock scraps and discards them; here we expose jax.profiler
traces, step timing, and device-memory stats as first-class utilities).
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a profiler trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Blocking per-step wall-clock timer with summary stats. Call
    `observe(result)` once per step with any device array from the step's
    outputs; the first `warmup` steps (compile) are excluded."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t = None

    def observe(self, result=None) -> Optional[float]:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = None
        if self._t is not None and self._n >= self.warmup:
            dt = now - self._t
            self.times.append(dt)
        self._t = now
        self._n += 1
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "min_s": ts[0],
            "max_s": ts[-1],
        }


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


def dump_profile(log_dir, timer: StepTimer) -> None:
    path = Path(log_dir) / "step_times.json"
    path.write_text(json.dumps({"summary": timer.summary()}, indent=2))
