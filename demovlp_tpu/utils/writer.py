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


class ExperimentWriter(MetricsWriter):
    """Experiment-object scalar sink (reference surface parity: when
    `trainer.neptune` is set, the reference passes its sacred Experiment as
    the writer, train_dist_multi.py:16-19,72-75). sacred/neptune are not
    installed here, so this adapter keeps the JSONL/TB sinks and forwards
    each scalar to any attached experiment object that duck-types
    `log_scalar(name, value, step)` (sacred's Experiment API). With no
    experiment attached it degrades to MetricsWriter — a config-gated no-op
    for the neptune path rather than a crash."""

    def __init__(self, log_dir, experiment=None, use_tensorboard: bool = True):
        super().__init__(log_dir, use_tensorboard=use_tensorboard)
        self.experiment = experiment

    def log_scalar(self, tag: str, value, step: Optional[int] = None) -> None:
        super().log_scalar(tag, value, step)
        if self.experiment is not None:
            try:
                name = f"{self.mode}/{tag}" if self.mode else tag
                self.experiment.log_scalar(
                    name, float(value), self.step if step is None else step
                )
            except Exception:  # experiment backends must never kill training
                pass
