"""Multiple-choice trainer (eval-only; reference Multi_ObjectMCTrainer_dist,
trainer/trainer_dist.py:704-893): each item = 1 video + 5 option texts; the
video tensors are expanded to the option count, scored by global + local
similarity, argmax over the 5 options. The reference merged per-rank results
through JSON temp files and a barrier (:831-849); here each host evaluates
its (process-sharded) loader shard and predictions are merged with a host
all-gather of (dataset-index, prediction) pairs — MC ids are strings, but
every host holds identical dataset metadata, so the dataset order provides
a shared integer key space. Correct for any process count.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from demovlp_tpu.utils.prng import fast_prng_key
from demovlp_tpu.parallel.mesh import (fetch_local_rows, host_allgather,
                                        shard_batch)
from demovlp_tpu.train.base_trainer import BaseTrainer
from demovlp_tpu.train.state import create_train_state
from demovlp_tpu.train.steps import (make_mc_eval_step,
                                     make_mc_eval_step_batched, prepare_batch)

logger = logging.getLogger(__name__)


def merge_mc_predictions(
    preds: Dict[Any, int],
    metadata_ids: List[Any],
    allgather: Callable = host_allgather,
) -> Dict[Any, int]:
    """Merge per-host {mc_id: pred} maps across processes (the TPU-native
    replacement for the reference's per-rank JSON files + barrier,
    trainer/trainer_dist.py:831-849). `metadata_ids` is the dataset's id
    sequence, identical on every host, giving string ids a shared integer
    encoding that `host_allgather` can ship."""
    id2idx = {mc_id: i for i, mc_id in enumerate(metadata_ids)}
    local_idx = np.asarray([id2idx[k] for k in preds], np.int64)
    local_pred = np.asarray(list(preds.values()), np.int64)
    # hosts can hold UNEQUAL counts (a corrupt sample resampled onto an
    # mc_id already in the shard collapses two dict entries), and
    # process_allgather needs equal shapes: gather the counts first, pad to
    # the max with -1 sentinels, drop them after the gather
    counts = allgather(np.asarray([local_idx.size], np.int64))
    cap = int(np.max(counts))
    if local_idx.size < cap:
        fill = np.full(cap - local_idx.size, -1, np.int64)
        local_idx = np.concatenate([local_idx, fill])
        local_pred = np.concatenate([local_pred, fill])
    all_idx = allgather(local_idx)
    all_pred = allgather(local_pred)
    return {
        metadata_ids[int(i)]: int(p)
        for i, p in zip(all_idx, all_pred)
        if i >= 0
    }


class MCTrainer(BaseTrainer):
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
        n_options: int = 5,
        **kwargs,
    ):
        super().__init__(model, loss, metrics, tx, config, mesh,
                         writer=writer, visualizer=visualizer, **kwargs)
        self.data_loader = data_loader
        self.valid_data_loader = valid_data_loader or []
        self.tokenizer = tokenizer
        self.n_options = n_options
        self.valid_gt_id2answer = {
            i: dl.dataset.id2answer for i, dl in enumerate(self.valid_data_loader)
        }

        # init stays threefry (deterministic golden params); the dropout
        # stream uses the fast rbg impl (utils/prng.py)
        self.init_rng = jax.random.PRNGKey(rng_seed)
        self.rng = fast_prng_key(rng_seed)
        ds = (data_loader or valid_data_loader)[0].dataset
        f, k = ds.segments, ds.object_num
        sample = {
            "input_ids": np.zeros((n_options, 100), np.int32),
            "attention_mask": np.ones((n_options, 100), np.int32),
            "object": np.zeros((n_options, f, k, 2054), np.float32),
            "object_mask": np.ones((n_options, f, k), np.float32),
        }
        self.state = create_train_state(model, tx, sample, self.init_rng, mesh)
        # B items per dispatch sharded over 'data' (default 8); 1 restores
        # the reference-shaped replicated batch-1 path. Equality between the
        # two is pinned by tests/test_mc_batched.py.
        self.mc_eval_batch = int(
            config.get("trainer", {}).get("mc_eval_batch", 8)
        )
        if self.mc_eval_batch > 1:
            # each dispatch shards the item axis over 'data' — round up so
            # the compiled shape divides evenly (pad rows are free anyway)
            dp = mesh.shape["data"]
            self.mc_eval_batch = -(-self.mc_eval_batch // dp) * dp
            self._eval_step = make_mc_eval_step_batched(
                model, loss, mesh, n_options
            )
        else:
            self._eval_step = make_mc_eval_step(model, loss, mesh, n_options)

    def _train_epoch(self, epoch: int):
        # eval-only task (reference trainer_dist.py:768 returns None)
        return None

    def _valid_batched(self, dl, params, preds: Dict) -> None:
        """Grouped MC eval: collect B loader items (each 1 video x n_opt
        texts), stack to (B, n_opt, ...) and score them in one sharded
        dispatch (steps.make_mc_eval_step_batched). The last group is padded
        by repeating its first item (flagged invalid) so every dispatch —
        and every host, with the loader's equal eval shares — runs the same
        compiled shape."""
        B = self.mc_eval_batch
        group: List[Dict[str, np.ndarray]] = []
        ids: List[Any] = []
        valid: List[bool] = []

        def flush():
            n_real = len(group)
            while len(group) < B:  # pad to the compiled batch shape
                group.append(group[0])
                valid.append(False)
            batch = {
                k: np.stack([g[k] for g in group])
                for k in ("input_ids", "attention_mask", "object",
                          "object_mask")
            }
            scores = fetch_local_rows(
                self._eval_step(params, shard_batch(batch, self.mesh))
            )  # (B, n_opt) — this host's own items
            for i in range(n_real):
                if valid[i]:
                    preds[ids[i]] = int(scores[i].argmax())
            group.clear()
            ids.clear()
            valid.clear()

        for data in dl:
            arrays = prepare_batch(data, self.tokenizer)
            arrays.pop("label", None)
            sample_valid = arrays.pop("sample_valid", None)
            n_opt = arrays["input_ids"].shape[0]
            arrays["object"] = np.repeat(data["object"], n_opt, axis=0)
            arrays["object_mask"] = np.repeat(
                data["object_mask"], n_opt, axis=0
            )
            group.append(arrays)
            ids.append(data["mc_id"][0])
            # multi-host wrap-pad duplicates are scored (host symmetry) but
            # never recorded
            valid.append(
                sample_valid is None or bool(sample_valid[0])
            )
            if len(group) == B:
                flush()
        if group:
            flush()

    def _valid_epoch(self, epoch: int) -> Dict[str, Any]:
        params = self.state.params
        nested_metrics: Dict[int, Dict[str, Any]] = {}
        pred_id2answer: Dict[int, Dict] = {}
        # default 1 so a trainer assembled without __init__ (the parity tests
        # build via object.__new__) follows the reference-shaped bs=1 path
        mc_eval_batch = getattr(self, "mc_eval_batch", 1)
        for dl_idx, dl in enumerate(self.valid_data_loader):
            preds: Dict = {}
            if mc_eval_batch > 1:
                self._valid_batched(dl, params, preds)
            else:
                for data in dl:
                    # batch_size 1: one video, n_options texts
                    arrays = prepare_batch(data, self.tokenizer)
                    arrays.pop("label", None)
                    # multi-host wrap-pad duplicate (data/loader.py): still
                    # run the (collective) eval step for host symmetry, but
                    # don't record the prediction
                    sample_valid = arrays.pop("sample_valid", None)
                    is_pad = (
                        sample_valid is not None and not bool(sample_valid[0])
                    )
                    n_opt = arrays["input_ids"].shape[0]
                    arrays["object"] = np.repeat(data["object"], n_opt, axis=0)
                    arrays["object_mask"] = np.repeat(
                        data["object_mask"], n_opt, axis=0
                    )
                    scores = np.asarray(self._eval_step(params, arrays))
                    if not is_pad:
                        preds[data["mc_id"][0]] = int(scores.argmax())
            # id2answer's insertion order = dataset metadata order, identical
            # on every host (and defined by all MC datasets incl. synthetic)
            preds = merge_mc_predictions(
                preds, list(self.valid_gt_id2answer[dl_idx])
            )
            pred_id2answer[dl_idx] = preds

            dl_metrics: Dict[str, Any] = {}
            for metric in self.metrics:
                res = metric(preds, self.valid_gt_id2answer[dl_idx])
                if jax.process_index() == 0:
                    print(res)
                dl_metrics[metric.__name__] = res
            nested_metrics[dl_idx] = dl_metrics
        res_dict = {
            f"val_loss_{i}": 0.0 for i in range(len(self.valid_data_loader))
        }
        res_dict["nested_val_metrics"] = nested_metrics
        return res_dict

    def train(self) -> Dict[str, Any]:
        # eval-only protocol: run validation once (configs use epochs=0)
        result = self._valid_epoch(0)
        return self._flatten_log(0, result)
