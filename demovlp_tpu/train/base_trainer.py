"""Epoch-loop base trainer.

Reference behavior preserved (base/base_trainer.py):
  * optional validation before training (init_val, :95-96)
  * epochs are 1-indexed: range(start_epoch, epochs+1)
  * nested val metrics flattened into `val_{dl}_{metric}_{sub}` log keys
    (:116-123)
  * "min val_loss_0"-style monitor; missing key disables monitoring with a
    warning (:139-145); a checkpoint is saved EVERY epoch, best copied
    (:154-155; the config's save_period is accepted but, like the reference,
    does not gate the per-epoch save)
  * early_stop is parsed but — exactly like the reference — never breaks the
    loop (the counter exists, no break statement does)
  * resume restores params/opt state/epoch/monitor_best

Distribution: no DDP wrap — the jitted step functions are SPMD over the mesh;
"rank 0" bookkeeping maps to jax.process_index() == 0.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from demovlp_tpu.train.checkpoint import CheckpointManager
from demovlp_tpu.train.optim import step_decay_lr


class BaseTrainer:
    def __init__(
        self,
        model,
        loss,
        metrics: List,
        tx,
        config,
        mesh,
        writer=None,
        visualizer=None,
        schedule=(30, 40),
        learning_rate1: float = 2e-4,
        lr_mode: str = "reference",
    ):
        self.model = model
        self.loss = loss
        self.metrics = metrics
        self.tx = tx
        self.config = config
        self.mesh = mesh
        self.writer = writer
        self.visualizer = visualizer
        self.schedule = list(schedule)
        self.learning_rate1 = learning_rate1
        self.lr_mode = lr_mode
        self.logger = logging.getLogger("trainer")

        cfg_trainer = config["trainer"]
        self.epochs = cfg_trainer["epochs"]
        self.save_period = cfg_trainer.get("save_period", 1)
        self.monitor = cfg_trainer.get("monitor", "off")
        self.init_val = cfg_trainer.get("init_val", True)
        self.base_lr = float(config["optimizer"]["args"].get("lr", 1e-5))

        if self.monitor == "off":
            self.mnt_mode, self.mnt_best = "off", 0
        else:
            self.mnt_mode, self.mnt_metric = self.monitor.split()
            assert self.mnt_mode in ("min", "max")
            self.mnt_best = np.inf if self.mnt_mode == "min" else -np.inf
            self.early_stop = cfg_trainer.get("early_stop", np.inf)

        self.start_epoch = 1
        self.checkpoint = CheckpointManager(
            config.save_dir,
            arch=type(model).__name__,
            config=dict(config.config),
            # async (default): the orbax write + commit marker land on a
            # waiter thread while the next epoch trains; train() waits at
            # the end. trainer.async_checkpoint=false restores blocking
            # saves.
            async_save=bool(cfg_trainer.get("async_checkpoint", True)),
        )
        self.state = None  # set by subclass

    # ---- subclass API ----------------------------------------------------
    def _train_epoch(self, epoch: int) -> Optional[Dict[str, Any]]:
        raise NotImplementedError

    def _valid_epoch(self, epoch: int) -> Optional[Dict[str, Any]]:
        raise NotImplementedError

    # ---- shared ------------------------------------------------------------
    def current_lr(self, epoch: int) -> float:
        return step_decay_lr(
            epoch, self.base_lr, self.learning_rate1, self.schedule, self.lr_mode
        )

    def resume(self, path) -> None:
        self.state, meta = self.checkpoint.restore(path, self.state)
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        if "monitor_best" in meta:
            self.mnt_best = meta["monitor_best"]
        self.logger.info("Resumed from %s at epoch %d", path, self.start_epoch)

    def _flatten_log(self, epoch: int, result: Dict[str, Any]) -> Dict[str, Any]:
        log: Dict[str, Any] = {"epoch": epoch}
        for key, value in (result or {}).items():
            if key == "nested_val_metrics":
                for dl_key, dl_val in value.items():
                    for m_key, m_val in dl_val.items():
                        if isinstance(m_val, dict):
                            for sub_key, sub_val in m_val.items():
                                log[f"val_{dl_key}_{m_key}_{sub_key}"] = sub_val
                        else:
                            log[f"val_{dl_key}_{m_key}"] = m_val
            else:
                log[key] = value
        return log

    def train(self) -> Dict[str, Any]:
        if self.init_val:
            self._valid_epoch(-1)

        final_log: Dict[str, Any] = {}
        for epoch in range(self.start_epoch, self.epochs + 1):
            result = self._train_epoch(epoch)
            log = self._flatten_log(epoch, result)

            if jax.process_index() == 0:
                for key, value in log.items():
                    if not isinstance(value, dict):
                        self.logger.info("    %-15s: %s", str(key), value)

            best = False
            if self.mnt_mode != "off":
                try:
                    improved = (
                        self.mnt_mode == "min" and log[self.mnt_metric] <= self.mnt_best
                    ) or (
                        self.mnt_mode == "max" and log[self.mnt_metric] >= self.mnt_best
                    )
                except KeyError:
                    self.logger.warning(
                        "Warning: Metric '%s' not found; monitoring disabled.",
                        self.mnt_metric,
                    )
                    self.mnt_mode = "off"
                    improved = False
                if improved:
                    self.mnt_best = log[self.mnt_metric]
                    best = True

            self.checkpoint.save(self.state, epoch, self.mnt_best, save_best=best)
            final_log = log
        # commit the last epoch's (possibly async) save before returning —
        # the waiter is a daemon thread and would die with the process
        self.checkpoint.wait()
        return final_log
