"""Scalar metric writers.

Duck-typed like the reference's TensorboardWriter (logger/visualization.py:
5-74): `.set_step(step, mode)` + `.log_scalar(tag, value)`. The default sink
is a JSONL file (always available, machine-readable); a TensorBoard sink is
attached when the `tensorboard` package is importable. A steps/sec timer is
recorded on step change like the reference's :42-49.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsWriter:
    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.log_dir / "scalars.jsonl", "a")
        self.step = 0
        self.mode = ""
        self._timer = time.time()
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None

    def set_step(self, step: int, mode: str = "train") -> None:
        self.mode = mode
        if step == 0:
            self._timer = time.time()
        else:
            now = time.time()
            dt = now - self._timer
            if dt > 0:
                self.log_scalar("steps_per_sec", (step - self.step) / dt)
            self._timer = now
        self.step = step

    def log_scalar(self, tag: str, value, step: Optional[int] = None) -> None:
        step = self.step if step is None else step
        tag = f"{self.mode}/{tag}" if self.mode else tag
        rec = {"tag": tag, "value": float(value), "step": int(step), "t": time.time()}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
