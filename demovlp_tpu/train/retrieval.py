"""Retrieval trainer (reference Multi_ObjectTrainer_dist,
trainer/trainer_dist.py:35-418).

Train: zip over the (possibly multiple) train loaders, alternating one batch
from each per step (:125-129), capped by max_samples_per_epoch (:126-128);
tokenize -> jitted SPMD train step -> step-decay LR applied per epoch.

Eval (:205-408): embed every val batch (jitted forward), assemble the full
embedding set on host, global cosine sim matrix + blockwise local
cross-attention sims sharded over the mesh (replacing the serial 8x8 device
loop at model/loss.py:73-103), then the numpy retrieval metrics. The
reference's orientation quirk is preserved exactly: the final matrix is
global_sims(text, video) + local_sims(video, text) summed elementwise
(trainer/trainer_dist.py:369-385), and MSCOCO-style configs dedup the
gallery by taking every 5th video row (:365-368).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from demovlp_tpu.parallel.tp import state_shardings_or_none
from demovlp_tpu.utils.prng import fast_prng_key
from demovlp_tpu.parallel.mesh import (fetch_local_rows,
                                        host_allgather_pylist,
                                        host_allgather_ragged, shard_batch)
from demovlp_tpu.parallel.sharded_eval import sharded_local_sims
from demovlp_tpu.ops.similarity import sim_matrix
from demovlp_tpu.train.async_metrics import DeferredMetrics
from demovlp_tpu.train.base_trainer import BaseTrainer
from demovlp_tpu.train.state import create_train_state
from demovlp_tpu.train.steps import (
    make_retrieval_eval_step,
    make_retrieval_train_step,
    pad_batch,
    parse_text_buckets,
    prepare_batch,
)

logger = logging.getLogger(__name__)


def verbose(epoch, metrics, mode, name="TEST"):
    msg = (
        f"[{mode}]{name:s} epoch {epoch}, R@1: {metrics['R1']:.1f}"
        f", R@5: {metrics['R5']:.1f}, R@10 {metrics['R10']:.1f}"
        f", R@50 {metrics['R50']:.1f}"
        f"MedR: {metrics['MedR']:g}, MeanR: {metrics['MeanR']:.1f}"
    )
    print(msg)
    return msg


class RetrievalTrainer(BaseTrainer):
    def __init__(
        self,
        model,
        loss,
        metrics,
        tx,
        config,
        mesh,
        data_loader: List,
        valid_data_loader: Optional[List] = None,
        tokenizer=None,
        writer=None,
        visualizer=None,
        max_samples_per_epoch: int = 50000,
        len_epoch: Optional[int] = None,
        rng_seed: int = 0,
        **kwargs,
    ):
        super().__init__(model, loss, metrics, tx, config, mesh,
                         writer=writer, visualizer=visualizer, **kwargs)
        self.data_loader = data_loader
        self.valid_data_loader = valid_data_loader or []
        self.do_validation = bool(self.valid_data_loader)
        self.tokenizer = tokenizer
        self.max_samples_per_epoch = max_samples_per_epoch
        self.len_epoch = len_epoch or min(len(dl) for dl in data_loader)
        self.total_batch_sum = sum(dl.batch_size for dl in data_loader)
        self.batch_size = data_loader[0].batch_size
        self.log_step = max(1, int(np.sqrt(self.batch_size)))
        # opt-in text-length buckets, TRAIN batches only (eval keeps the
        # fixed length: gathered embeddings must share one shape); parity
        # notes in train/steps.py prepare_batch + PARITY.md #14
        self.text_buckets = parse_text_buckets(config["trainer"])
        self.eval_segment = int(
            config.get("eval", {}).get("local_sim_segment", 64)
        )
        # "auto": fused Pallas kernel on TPU, XLA elsewhere (BENCH_NOTES.md)
        self.eval_backend = config.get("eval", {}).get("xattn_backend", "auto")

        # optional MLM pre-training objective (config "mlm": {weight, ...})
        mlm_cfg = config.get("mlm", {}) or {}
        self.mlm_weight = float(mlm_cfg.get("weight", 0.0))
        self.mlm_prob = float(mlm_cfg.get("mask_prob", 0.15))
        self.mlm_mask_token = int(mlm_cfg.get("mask_token_id", 103))
        self.mlm_vocab = int(
            mlm_cfg.get("vocab_size", getattr(model, "text_config").vocab_size)
        )
        self._mlm_rng = np.random.default_rng(rng_seed + 1)

        # init stays threefry (deterministic golden params); the dropout
        # stream uses the fast rbg impl (utils/prng.py)
        self.init_rng = jax.random.PRNGKey(rng_seed)
        self.rng = fast_prng_key(rng_seed)
        sample = self._first_batch_template()
        self.state = create_train_state(model, tx, sample, self.init_rng, mesh)
        self._train_step = make_retrieval_train_step(
            model, loss, tx, mesh, mlm_weight=self.mlm_weight,
            state_sharding=state_shardings_or_none(self.state, mesh),
        )
        self._eval_step = make_retrieval_eval_step(model, loss, mesh)

    # ------------------------------------------------------------------
    def _first_batch_template(self) -> Dict[str, np.ndarray]:
        dl = self.data_loader[0]
        ds = dl.dataset
        f, k = ds.segments, ds.object_num
        b = dl.batch_size
        return {
            "input_ids": np.zeros((b, 100), np.int32),
            "attention_mask": np.ones((b, 100), np.int32),
            "object": np.zeros((b, f, k, 2054), np.float32),
            "object_mask": np.ones((b, f, k), np.float32),
        }

    def _train_epoch(self, epoch: int) -> Dict[str, Any]:
        lr = self.current_lr(epoch)
        total_loss = [0.0] * len(self.data_loader)
        n_steps = 0
        for dl in self.data_loader:
            dl.set_epoch(epoch)

        # metrics are fetched one step late (train/async_metrics.py): the
        # host preps batch i+1 while the device runs step i instead of
        # blocking on step i's loss scalar before touching batch i+1.
        # state.step is a device scalar — track the global step on host.
        host_step = int(self.state.step)

        def _consume(m, dl_idx, batch_idx, step_no):
            loss_v = float(m["loss"])
            if batch_idx % self.log_step == 0 and jax.process_index() == 0:
                print(
                    f"loss:{loss_v}, global_loss: {float(m['global_loss'])},"
                    f" local_loss: {float(m['local_loss'])}"
                )
                logger.debug(
                    "Train Epoch: %d dl%d [%d/%d] Loss: %.6f",
                    epoch, dl_idx, batch_idx, self.len_epoch, loss_v,
                )
            total_loss[dl_idx] += loss_v
            if self.writer is not None and jax.process_index() == 0:
                self.writer.set_step(step_no, "train")
                self.writer.log_scalar(f"loss_train_{dl_idx}", loss_v)

        deferred = DeferredMetrics(_consume)

        for batch_idx, data_li in enumerate(zip(*self.data_loader)):
            if (batch_idx + 1) * self.total_batch_sum > self.max_samples_per_epoch:
                break
            for dl_idx, data in enumerate(data_li):
                arrays = prepare_batch(
                    data, self.tokenizer, text_buckets=self.text_buckets
                )
                arrays.pop("label", None)
                if self.mlm_weight:
                    from demovlp_tpu.data.mlm import mask_batch_text_tokens

                    masked, labels = mask_batch_text_tokens(
                        arrays["input_ids"],
                        arrays["attention_mask"],
                        mask_token_id=self.mlm_mask_token,
                        vocab_size=self.mlm_vocab,
                        rng=self._mlm_rng,
                        mlm_probability=self.mlm_prob,
                    )
                    arrays["input_ids"] = masked
                    arrays["mlm_labels"] = labels
                arrays = shard_batch(arrays, self.mesh)
                self.state, m = self._train_step(self.state, arrays, lr, self.rng)
                host_step += 1
                deferred.push(m, dl_idx, batch_idx, host_step)
                n_steps += 1
            if batch_idx == self.len_epoch:
                break
        deferred.flush()

        denom = max(1, n_steps // max(1, len(self.data_loader)))
        log = {
            f"loss_{i}": total_loss[i] / denom for i in range(len(self.data_loader))
        }
        if self.do_validation:
            val_log = self._valid_epoch(epoch)
            log.update(val_log)
        return log

    # ------------------------------------------------------------------
    def _valid_epoch(self, epoch: int) -> Dict[str, Any]:
        params = self.state.params
        res_dict: Dict[str, Any] = {}
        nested_metrics: Dict[int, Dict[str, Any]] = {}

        for dl_idx, dl in enumerate(self.valid_data_loader):
            arrs = {
                k: []
                for k in (
                    "g_t", "g_o", "l_t", "l_o", "o_mask", "t_mask", "t_len",
                )
            }
            metas: List[Dict] = []
            total_val_loss = 0.0
            n_batches = 0
            for data in dl:
                arrays = prepare_batch(data, self.tokenizer)
                arrays.pop("label", None)
                # multi-host wrap-pad flags from the loader (data/loader.py
                # _host_indices) + shape padding of the shared tail batch:
                # both become one 0/1 "valid" row mask, excluded from the
                # loss in-jit and dropped from the gathered embeddings
                sample_valid = arrays.pop("sample_valid", None)
                arrays, n_valid = pad_batch(arrays, dl.batch_size)
                valid = (np.arange(dl.batch_size) < n_valid).astype(np.float32)
                if sample_valid is not None:
                    valid[:n_valid] *= sample_valid
                arrays["valid"] = valid
                keep = valid.astype(bool)
                metas.extend(
                    m for m, k in zip(data["meta"], keep[: len(data["meta"])]) if k
                )
                arrays = shard_batch(arrays, self.mesh)
                out, (loss, g, l) = self._eval_step(params, arrays)
                total_val_loss += float(loss)
                n_batches += 1
                # outputs are 'data'-sharded over the GLOBAL mesh; each host
                # keeps its own rows (the ones it fed in) — the per-split
                # ragged gather below reassembles dataset order
                arrs["g_t"].append(
                    fetch_local_rows(out["global_text_embeddings"])[keep]
                )
                arrs["g_o"].append(
                    fetch_local_rows(out["global_object_embeddings"])[keep]
                )
                arrs["l_t"].append(
                    fetch_local_rows(out["local_text_embeddings"])[keep]
                )
                arrs["l_o"].append(
                    fetch_local_rows(out["local_object_embeddings"])[keep]
                )
                arrs["o_mask"].append(fetch_local_rows(out["object_mask"])[keep])
                arrs["t_mask"].append(fetch_local_rows(out["text_mask_add"])[keep])
                arrs["t_len"].append(fetch_local_rows(out["text_length"])[keep])

            cat = {k: np.concatenate(v, axis=0) for k, v in arrs.items()}
            # multi-host: each host embedded its contiguous loader shard;
            # the ragged gather (per-host counts differ around the split
            # remainder) restores the exact dataset order and covers the
            # whole val split — no sample is dropped at any process count
            cat = {k: host_allgather_ragged(v) for k, v in cat.items()}
            if str(self.config["name"]).startswith("MSCOCO"):
                for key in ("g_o", "l_o", "o_mask"):
                    cat[key] = cat[key][::5]

            o2t_sims = np.asarray(sim_matrix(cat["g_t"], cat["g_o"]))
            use_local = self.config["loss"]["args"].get("use_local", True)
            if use_local:
                local_sims = sharded_local_sims(
                    cat["l_o"],
                    cat["l_t"],
                    cat["o_mask"],
                    cat["t_mask"],
                    self.mesh,
                    segment=self.eval_segment,
                    lambda_softmax=self.loss.local_loss.lambda_softmax,
                    focal_type=self.loss.local_loss.focal_type,
                    backend=self.eval_backend,
                )
                # reference orientation quirk: (text,video) + (video,text)
                o2t_sims = o2t_sims + local_sims

            dl_metrics: Dict[str, Any] = {}
            for metric in self.metrics:
                res = metric(o2t_sims)
                if jax.process_index() == 0:
                    verbose(epoch, res, name=dl.dataset_name, mode=metric.__name__)
                dl_metrics[metric.__name__] = res
            nested_metrics[dl_idx] = dl_metrics

            if self.visualizer is not None:
                # metas are host-local but o2t_sims rows are the globally
                # gathered split: gather the metadata the same way (string
                # gather is collective — run it on every process, render on
                # process 0 only)
                meta_for_vis = {
                    "paths": host_allgather_pylist(
                        [m.get("paths", "") for m in metas]
                    ),
                    "raw_captions": host_allgather_pylist(
                        [m.get("raw_captions", "") for m in metas]
                    ),
                }
                if jax.process_index() == 0:
                    self.visualizer.visualize_ranking(
                        o2t_sims, epoch, meta_for_vis, dl_metrics
                    )

            res_dict[f"val_loss_{dl_idx}"] = total_val_loss / max(1, n_batches)
            if self.writer is not None and jax.process_index() == 0:
                self.writer.log_scalar(
                    f"loss_val_{dl_idx}", res_dict[f"val_loss_{dl_idx}"]
                )

        res_dict["nested_val_metrics"] = nested_metrics
        return res_dict
