"""Checkpoint save/resume via orbax.

Reference behavior (base/base_trainer.py:176-267): per-epoch rank-0 save of
{arch, epoch, state_dict, optimizer, monitor_best, config} to
checkpoint-epoch{N} plus model_best on improvement; resume restores
epoch/monitor/optimizer with arch/optimizer-type mismatch warnings.
Here: orbax StandardCheckpointer over the TrainState pytree + a JSON sidecar
for {arch, epoch, monitor_best, config}; `model_best` is a directory copy.
Multi-host safe: orbax coordinates across processes; host-side metadata is
written by process 0 only.
"""
from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, save_dir, arch: str = "", config: Optional[dict] = None):
        self.save_dir = Path(save_dir).absolute()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.arch = arch
        self.config = config or {}
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int) -> Path:
        return self.save_dir / f"checkpoint-epoch{epoch}"

    def save(self, state, epoch: int, monitor_best: float, save_best: bool = False):
        from demovlp_tpu.parallel.mesh import sync_processes

        path = self._path(epoch)
        # stale-dir removal is process-0's job (shared filesystem); the
        # barrier keeps other processes from starting the coordinated orbax
        # save into a directory that is mid-removal
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        sync_processes(f"ckpt_clear_epoch{epoch}")
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        sync_processes(f"ckpt_saved_epoch{epoch}")
        if jax.process_index() == 0:
            meta = {
                "arch": self.arch,
                "epoch": epoch,
                "monitor_best": float(monitor_best),
                "config": self.config,
            }
            (path / "meta.json").write_text(json.dumps(meta))
            logger.info("Saving checkpoint: %s ...", path)
            if save_best:
                best = self.save_dir / "model_best"
                if best.exists():
                    shutil.rmtree(best)
                shutil.copytree(path, best)
                logger.info("Saving current best: model_best ...")

    def restore(self, path, state_template) -> tuple[Any, dict]:
        """Returns (state, meta). `state_template` provides the pytree
        structure/shapes (an abstract or concrete TrainState)."""
        path = Path(path).absolute()
        state = self._ckptr.restore(path, state_template)
        meta_file = path / "meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        if meta:
            if meta.get("arch") and self.arch and meta["arch"] != self.arch:
                logger.warning(
                    "Architecture in checkpoint (%s) differs from current (%s).",
                    meta["arch"],
                    self.arch,
                )
            ck_opt = meta.get("config", {}).get("optimizer", {}).get("type")
            cur_opt = self.config.get("optimizer", {}).get("type")
            if ck_opt and cur_opt and ck_opt != cur_opt:
                logger.warning(
                    "Optimizer type changed (%s -> %s); resuming anyway "
                    "(state shapes must match).",
                    ck_opt,
                    cur_opt,
                )
        return state, meta

    def latest(self) -> Optional[Path]:
        cands = sorted(
            self.save_dir.glob("checkpoint-epoch*"),
            key=lambda p: int(p.name.rsplit("epoch", 1)[1]),
        )
        return cands[-1] if cands else None


def find_latest_checkpoint(save_root, exper_name: str) -> Optional[Path]:
    """Newest checkpoint across a config's timestamped run dirs — powers
    `trainer.resume: "auto"` (net-new: the reference requires an explicit
    -r path; auto-resume is the minimal fault-recovery story for preemptible
    TPU jobs: re-launch the same command, training continues)."""
    base = Path(save_root) / "models" / exper_name
    if not base.exists():
        return None
    for run_dir in sorted(base.iterdir(), reverse=True):
        if not run_dir.is_dir():
            continue
        cands = sorted(
            run_dir.glob("checkpoint-epoch*"),
            key=lambda p: int(p.name.rsplit("epoch", 1)[1]),
        )
        if cands:
            return cands[-1]
    return None
