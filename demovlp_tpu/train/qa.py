"""Video-QA trainer (reference Multi_ObjectQATrainer_dist,
trainer/trainer_dist.py:421-701): CE on classifier logits + running accuracy;
eval collects (question_id, logits) for every val sample, argmaxes, and
scores with evaluate_qa's per-answer-type breakdown. The reference's
cross-rank all_gathers (:619-643) are unnecessary here: the jitted step sees
the global batch, and host assembly covers the full val set.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from demovlp_tpu.parallel.tp import state_shardings_or_none
from demovlp_tpu.utils.prng import fast_prng_key
from demovlp_tpu.parallel.mesh import shard_batch
from demovlp_tpu.train.async_metrics import DeferredMetrics
from demovlp_tpu.train.base_trainer import BaseTrainer
from demovlp_tpu.train.state import create_train_state
from demovlp_tpu.train.steps import (
    make_qa_eval_step,
    make_qa_train_step,
    pad_batch,
    parse_text_buckets,
    prepare_batch,
)

logger = logging.getLogger(__name__)


class QATrainer(BaseTrainer):
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
        # fixed length); the QA head max-pools text over ALL positions incl.
        # pads (reference model/model.py:286) so trimming shifts QA numerics
        # slightly — see train/steps.py prepare_batch + PARITY.md #14
        self.text_buckets = parse_text_buckets(config["trainer"])

        self.valid_label2ans = {
            i: dl.dataset.label2ans for i, dl in enumerate(self.valid_data_loader)
        }
        self.valid_qid2data = {
            i: dl.dataset.qid2data for i, dl in enumerate(self.valid_data_loader)
        }

        # init stays threefry (deterministic golden params); the dropout
        # stream uses the fast rbg impl (utils/prng.py)
        self.init_rng = jax.random.PRNGKey(rng_seed)
        self.rng = fast_prng_key(rng_seed)
        ds = data_loader[0].dataset
        b, f, k = data_loader[0].batch_size, ds.segments, ds.object_num
        sample = {
            "input_ids": np.zeros((b, 100), np.int32),
            "attention_mask": np.ones((b, 100), np.int32),
            "object": np.zeros((b, f, k, 2054), np.float32),
            "object_mask": np.ones((b, f, k), np.float32),
        }
        self.state = create_train_state(model, tx, sample, self.init_rng, mesh)
        self._train_step = make_qa_train_step(
            model, loss, tx, mesh,
            state_sharding=state_shardings_or_none(self.state, mesh),
        )
        self._eval_step = make_qa_eval_step(model, mesh)

    def _train_epoch(self, epoch: int) -> Dict[str, Any]:
        lr = self.current_lr(epoch)
        total_loss = [0.0] * len(self.data_loader)
        pos_cnt, tot_cnt = 0.0, 0.0
        n_steps = 0
        for dl in self.data_loader:
            dl.set_epoch(epoch)

        # one-step-delayed metric fetch (train/async_metrics.py): keeps the
        # host preparing batch i+1 while the device runs step i
        host_step = int(self.state.step)

        def _consume(m, dl_idx, batch_idx, step_no, n_text):
            nonlocal pos_cnt, tot_cnt
            loss_v = float(m["loss"])
            pos_cnt += float(m["correct"])
            tot_cnt += n_text
            total_loss[dl_idx] += loss_v
            if batch_idx % self.log_step == 0 and jax.process_index() == 0:
                print(
                    f"loss:{loss_v}, acc: {pos_cnt / max(1, tot_cnt)},"
                    f" postive/all : {pos_cnt}/{tot_cnt}"
                )
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
                arrays = shard_batch(arrays, self.mesh)
                self.state, m = self._train_step(self.state, arrays, lr, self.rng)
                host_step += 1
                deferred.push(m, dl_idx, batch_idx, host_step, len(data["text"]))
                n_steps += 1
            if batch_idx == self.len_epoch:
                break
        deferred.flush()

        denom = max(1, n_steps // max(1, len(self.data_loader)))
        log = {
            f"loss_{i}": total_loss[i] / denom for i in range(len(self.data_loader))
        }
        log["train_acc"] = pos_cnt / max(1, tot_cnt)
        if self.do_validation:
            log.update(self._valid_epoch(epoch))
        return log

    def _valid_epoch(self, epoch: int) -> Dict[str, Any]:
        params = self.state.params
        nested_metrics: Dict[int, Dict[str, Any]] = {}
        res_dict: Dict[str, Any] = {}
        for dl_idx, dl in enumerate(self.valid_data_loader):
            results = []
            preds_l, qids_l = [], []
            for data in dl:
                arrays = prepare_batch(data, self.tokenizer)
                arrays.pop("label", None)
                # multi-host wrap-pad flags + tail-batch shape padding ->
                # one keep mask (see train/retrieval.py)
                sample_valid = arrays.pop("sample_valid", None)
                arrays, n_valid = pad_batch(arrays, dl.batch_size)
                keep = np.arange(dl.batch_size) < n_valid
                if sample_valid is not None:
                    keep[:n_valid] &= sample_valid.astype(bool)
                arrays = shard_batch(arrays, self.mesh)
                # logits are 'data'-sharded over the GLOBAL mesh: keep this
                # host's own rows; one gather after the loop reassembles
                # dataset order (host shards are contiguous)
                from demovlp_tpu.parallel.mesh import fetch_local_rows

                logits = fetch_local_rows(self._eval_step(params, arrays))[keep]
                preds_l.append(logits.argmax(axis=-1))
                qids_l.append(
                    np.asarray(data["question_id"])[keep[: len(data["question_id"])]]
                )
            preds = (np.concatenate(preds_l) if preds_l
                     else np.zeros((0,), np.int64))
            qids = (np.concatenate(qids_l) if qids_l
                    else np.zeros((0,), np.int64))
            if jax.process_count() > 1:
                from demovlp_tpu.parallel.mesh import host_allgather_ragged

                preds = host_allgather_ragged(preds)
                qids = host_allgather_ragged(qids)
            for qid, pred in zip(qids, preds):
                results.append(
                    dict(
                        question_id=int(qid),
                        answer=int(pred),
                        data=self.valid_qid2data[dl_idx][int(qid)],
                    )
                )
            if jax.process_index() == 0:
                print(f"Get {len(results)} results.")
            dl_metrics: Dict[str, Any] = {}
            for metric in self.metrics:
                res = metric(
                    results, self.valid_label2ans[dl_idx], self.valid_qid2data[dl_idx]
                )
                if jax.process_index() == 0:
                    print(res)
                dl_metrics[metric.__name__] = res
            nested_metrics[dl_idx] = dl_metrics
            res_dict[f"val_loss_{dl_idx}"] = 0.0
        res_dict["nested_val_metrics"] = nested_metrics
        return res_dict
