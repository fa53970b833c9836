"""Checkpoint save/resume via orbax — preemption-safe and (by default) async.

Reference behavior (base/base_trainer.py:176-267): per-epoch rank-0 save of
{arch, epoch, state_dict, optimizer, monitor_best, config} to
checkpoint-epoch{N} plus model_best on improvement; resume restores
epoch/monitor/optimizer with arch/optimizer-type mismatch warnings.
Here: orbax StandardCheckpointer over the TrainState pytree + a JSON sidecar
for {arch, epoch, monitor_best, config}; `model_best` is a directory copy.
Multi-host safe: orbax coordinates across processes; host-side metadata is
written by process 0 only.

Beyond the reference: `save()` returns after the blocking device->host copy
and finalizes (orbax background write + meta.json + model_best) on a waiter
thread, so serialization overlaps the next epoch's compute. meta.json is the
COMMIT MARKER: it is written strictly after orbax finalizes the directory,
and latest()/find_latest_checkpoint() only consider checkpoints that have
it — a SIGKILL at any instant leaves either a complete checkpoint or one
that auto-resume provably ignores (tests/test_preemption.py kills a live
run and asserts bit-identical recovery).
"""
from __future__ import annotations

import json
import logging
import re
import shutil
import threading
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

_CKPT_RE = re.compile(r"checkpoint-epoch(\d+)$")


def _is_complete(path: Path) -> bool:
    """A checkpoint directory is resumable iff its commit marker exists."""
    return _CKPT_RE.search(path.name) is not None and (
        path / "meta.json"
    ).exists()


class CheckpointManager:
    def __init__(self, save_dir, arch: str = "", config: Optional[dict] = None,
                 async_save: bool = True):
        self.save_dir = Path(save_dir).absolute()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.arch = arch
        self.config = config or {}
        self.async_save = async_save
        self._ckptr = ocp.StandardCheckpointer()
        self._waiter: Optional[threading.Thread] = None
        self._waiter_exc: Optional[BaseException] = None

    def _path(self, epoch: int) -> Path:
        return self.save_dir / f"checkpoint-epoch{epoch}"

    def save(self, state, epoch: int, monitor_best: float, save_best: bool = False):
        from demovlp_tpu.parallel.mesh import sync_processes

        self.wait()  # finalize any in-flight save before touching dirs
        path = self._path(epoch)
        # stale-dir removal is process-0's job (shared filesystem); the
        # barrier keeps other processes from starting the coordinated orbax
        # save into a directory that is mid-removal. A killed run can also
        # leave orbax's tmp dir behind — clear it or the re-save fails.
        if jax.process_index() == 0:
            if path.exists():
                shutil.rmtree(path)
            for tmp in self.save_dir.glob(path.name + ".orbax-checkpoint-tmp*"):
                shutil.rmtree(tmp)
        sync_processes(f"ckpt_clear_epoch{epoch}")
        # blocking portion = device->host copy only: after this returns the
        # arrays may be donated by the next train step while the background
        # thread writes them out
        self._ckptr.save(path, state)
        meta = {
            "arch": self.arch,
            "epoch": epoch,
            "monitor_best": float(monitor_best),
            "config": self.config,
        }

        def _finalize():
            # orbax coordinates the cross-process commit internally (via the
            # distributed KV store, not XLA collectives), so this is safe on
            # a non-main thread alongside the next epoch's train steps
            self._ckptr.wait_until_finished()
            if jax.process_index() == 0:
                (path / "meta.json").write_text(json.dumps(meta))
                logger.info("Saving checkpoint: %s ...", path)
                if save_best:
                    best = self.save_dir / "model_best"
                    if best.exists():
                        shutil.rmtree(best)
                    shutil.copytree(path, best)
                    logger.info("Saving current best: model_best ...")

        if not self.async_save:
            _finalize()
            sync_processes(f"ckpt_saved_epoch{epoch}")
            return

        def _run():
            try:
                _finalize()
            except BaseException as exc:  # surfaced by the next wait()
                self._waiter_exc = exc

        self._waiter = threading.Thread(
            target=_run, name=f"ckpt-finalize-epoch{epoch}", daemon=True
        )
        self._waiter.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) is fully committed —
        meta.json written, model_best copied. Must be called before process
        exit (daemon threads die with the interpreter) and runs implicitly
        before the next save/restore/latest."""
        t, self._waiter = self._waiter, None
        if t is not None:
            t.join()
            exc, self._waiter_exc = self._waiter_exc, None
            if exc is not None:
                raise exc
        else:
            self._ckptr.wait_until_finished()

    def restore(self, path, state_template) -> tuple[Any, dict]:
        """Returns (state, meta). `state_template` provides the pytree
        structure/shapes (an abstract or concrete TrainState)."""
        self.wait()
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
        """Newest COMPLETE checkpoint (commit marker present) — skips orbax
        tmp dirs and checkpoints a kill interrupted before commit."""
        self.wait()
        cands = sorted(
            (p for p in self.save_dir.glob("checkpoint-epoch*")
             if _is_complete(p)),
            key=lambda p: int(_CKPT_RE.search(p.name).group(1)),
        )
        return cands[-1] if cands else None


def find_latest_checkpoint(save_root, exper_name: str) -> Optional[Path]:
    """Newest COMPLETE checkpoint across a config's timestamped run dirs —
    powers `trainer.resume: "auto"` (net-new: the reference requires an
    explicit -r path; auto-resume is the minimal fault-recovery story for
    preemptible TPU jobs: re-launch the same command, training continues).
    Incomplete checkpoints (no meta.json commit marker — the save was
    interrupted) and orbax tmp dirs are never selected."""
    base = Path(save_root) / "models" / exper_name
    if not base.exists():
        return None
    for run_dir in sorted(base.iterdir(), reverse=True):
        if not run_dir.is_dir():
            continue
        cands = sorted(
            (p for p in run_dir.glob("checkpoint-epoch*")
             if _is_complete(p)),
            key=lambda p: int(_CKPT_RE.search(p.name).group(1)),
        )
        if cands:
            return cands[-1]
    return None
