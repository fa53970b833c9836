"""Jitted SPMD step functions + host-side batch preparation.

One compiled executable per (task, shape): the batcher guarantees fixed
shapes, so each step function compiles once and runs every step. The batch
is sharded over the mesh's 'data' axis; params are replicated; XLA inserts
the gradient psum over ICI — the whole NCCL/DDP layer of the reference
(base/base_trainer.py:30-33) reduces to these sharding annotations. Because
the loss sees the GLOBAL batch inside jit, contrastive negatives span all
devices — the upgrade of the reference's dormant AllGather_multi
(trainer/trainer_dist.py:13-31).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from demovlp_tpu.ops.masking import additive_mask
from demovlp_tpu.ops.similarity import sim_matrix
from demovlp_tpu.parallel.mesh import batch_sharding, replicated_sharding
from demovlp_tpu.train.state import TrainState


# ---------------------------------------------------------------- host side
def prepare_batch(
    batch: Dict[str, Any],
    tokenizer,
    max_text_len: int = 100,
    text_buckets=None,
):
    """Tokenize text and assemble the model's array batch (host numpy).

    text_buckets: optional sorted lengths (e.g. [32, 48, 64]). The padded
    (B, max_text_len) encoding is trimmed to the smallest bucket that still
    holds the batch's longest caption (never trimming a real token), so
    short-caption batches run the text tower + O(B^2) local loss at a
    fraction of the fixed-100 cost. The reference always pads to 100
    (trainer/trainer_dist.py:135-137). This is an opt-in PERF knob, default
    off (PARITY.md): the trim is bit-exact for everything that only reads
    masked text — the tower itself and the global CLS contrastive loss —
    but the reference deliberately reads PAD positions in two places, so
    those see a small numerics shift when columns are dropped: the local
    RWA loss averages per-position cosine over ALL query positions incl.
    pads (model/loss.py:317-327), and QA max-pools projected text over ALL
    positions (model/model.py:286). Both are pinned (exact global /
    bounded local) by tests/test_text_buckets.py. Each bucket length is one
    extra compiled executable (static shapes), which is why this takes a
    small explicit list rather than pad-to-longest.
    """
    text = batch["text"]
    if text and isinstance(text[0], (list, tuple)):  # MC: flatten options
        text = [t for opts in text for t in opts]
    enc = tokenizer(text, max_length=max_text_len)
    if text_buckets:
        longest = int(enc["attention_mask"].sum(axis=1).max())
        L = enc["input_ids"].shape[1]
        target = min(
            (b for b in text_buckets if longest <= b < L), default=L
        )
        # Multi-process: the bucket must be decided from the GLOBAL batch,
        # not this host's shard — shard_batch assembles the global array
        # from identically-shaped local shards, and a per-host choice would
        # dispatch differently-shaped collective train steps across
        # processes (distributed deadlock). max over hosts of the local
        # bucket == the bucket of the global longest caption (the bucket
        # map is monotone), i.e. exactly what a single process holding the
        # whole batch would pick. Equal per-host batch counts (loader
        # drop_last / eval wrap-pad) keep this tiny allgather aligned.
        if jax.process_count() > 1:
            from demovlp_tpu.parallel.mesh import host_allgather

            target = int(
                host_allgather(np.asarray([target], np.int32)).max()
            )
        if target < L:
            enc = {
                "input_ids": enc["input_ids"][:, :target],
                "attention_mask": enc["attention_mask"][:, :target],
            }
    arrays = {
        "input_ids": enc["input_ids"],
        "attention_mask": enc["attention_mask"],
        "object": batch["object"],
        "object_mask": batch["object_mask"],
    }
    if "label" in batch:
        arrays["label"] = batch["label"]
    if "sample_valid" in batch:
        arrays["sample_valid"] = batch["sample_valid"]
    return arrays


def parse_text_buckets(trainer_cfg):
    """`trainer.text_buckets` config knob -> sorted int list or None.
    Shared by the trainers; semantics and parity notes in prepare_batch."""
    return sorted(
        int(b) for b in (trainer_cfg.get("text_buckets") or [])
    ) or None


def pad_batch(arrays: Dict[str, np.ndarray], target: int) -> Tuple[Dict, int]:
    """Pad the batch axis to `target` rows (repeating row 0) so eval keeps a
    single compiled shape; returns (padded, n_valid)."""
    n = next(iter(arrays.values())).shape[0]
    if n == target:
        return arrays, n
    assert n < target, (n, target)
    out = {}
    for k, v in arrays.items():
        pad = np.repeat(v[:1], target - n, axis=0)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, n


# ------------------------------------------------------------- device side
def _retrieval_losses(loss_obj, outputs, batch, valid=None):
    # towers may run in bfloat16; the contrastive losses (log-softmax,
    # l2 norms) are computed in fp32 for stability.
    # valid: optional (B,) 0/1 sample mask — eval excludes padded/duplicate
    # rows from the loss (equals the loss over the valid rows alone)
    f32 = lambda x: x.astype(jnp.float32)
    global_sim = sim_matrix(
        f32(outputs["global_text_embeddings"]),
        f32(outputs["global_object_embeddings"]),
    )
    text_mask = additive_mask(batch["attention_mask"][:, 1:])
    text_len = jnp.sum(batch["attention_mask"], axis=1)
    return loss_obj(
        global_sim,
        f32(outputs["local_object_embeddings"]),
        f32(outputs["local_text_embeddings"]),
        outputs["object_mask"],
        text_len,
        text_mask,
        valid=valid,
    )


# params that the models consume in f32 BY DESIGN even with bf16 towers:
# norm scales/biases (norm layers compute f32 stats, models/layers.py), the
# text token/position tables (nn.Embed(dtype=f32) — gather first, cast the
# (B,L,D) result, not the (vocab,D) table), and the additive region
# position/temporal embeds (f32 adds). Pre-casting any of these would break
# the "identical to the per-op casts" contract below.
_CAST_EXEMPT = ("word_embeddings", "position_embeddings",
                "custom_pos_embed", "temporal_embed")


def _cast_exempt_path(path) -> bool:
    for k in path:
        name = str(getattr(k, "key", getattr(k, "name", k))).lower()
        if "norm" in name or name in _CAST_EXEMPT:
            return True
    return False


def cast_tower_weights(params, dtype=jnp.bfloat16):
    """Cast the matmul-consumed f32 weights to `dtype` (one fused pass).

    With dtype=bf16 towers, flax Dense casts its f32 kernels to bf16 at
    every use — each matmul re-reads the f32 master copy from HBM and pays
    a convert. Casting the tree ONCE per step makes the bf16 copies
    resident: the forward and backward matmuls read half the weight bytes
    and the per-op converts disappear. Numerically identical to the
    per-op casts (same bf16 rounding); the _CAST_EXEMPT params stay f32
    because the models never round them at use."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: x.astype(dtype)
        if (x.dtype == jnp.float32 and not _cast_exempt_path(p))
        else x,
        params,
    )


def mlm_loss_fn(logits, labels, ignore_index: int = -100):
    """Masked-LM CE averaged over the selected (label != ignore) positions."""
    logits = logits.astype(jnp.float32)
    valid = (labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def make_retrieval_train_step(
    model, loss_obj, tx, mesh, mlm_weight: float = 0.0,
    deterministic: bool = False, state_sharding=None,
    cast_weights: bool = False,
) -> Callable:
    """state_sharding: optional TrainState-shaped NamedSharding pytree (see
    parallel/tp.py) — tensor-parallel layouts over the 'model' axis. Default
    None keeps params/opt_state replicated (pure data parallel).
    cast_weights: one fused f32->bf16 cast of the non-norm weights per step
    (see cast_tower_weights); numerics-identical for bf16-dtype models."""
    def step(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if cast_weights:
                params = cast_tower_weights(params)
            out = model.apply(
                params, batch, deterministic=deterministic,
                rngs={"dropout": rng},
            )
            total, g, l = _retrieval_losses(loss_obj, out, batch)
            mlm = jnp.zeros((), jnp.float32)
            if mlm_weight:
                mlm = mlm_loss_fn(out["mlm_logits"], batch["mlm_labels"])
                total = total + mlm_weight * mlm
            return total, (g, l, mlm)

        (total, (g, l, mlm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=new_opt, step=state.step + 1)
        metrics = {"loss": total, "global_loss": g, "local_loss": l, "mlm_loss": mlm}
        return new_state, metrics

    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    st = state_sharding if state_sharding is not None else rep
    return jax.jit(
        step,
        in_shardings=(st, dat, None, None),
        out_shardings=(st, rep),
        donate_argnums=(0,),
    )


def make_retrieval_eval_step(model, loss_obj, mesh) -> Callable:
    """Forward + per-batch loss; returns the embedding dict (+losses) with
    everything needed for metric assembly on host. An optional batch["valid"]
    (B,) 0/1 mask excludes pad/duplicate rows from the loss (the reference
    never sees ragged eval batches — its DistributedSampler drops them)."""

    def step(params, batch):
        batch = dict(batch)
        valid = batch.pop("valid", None)
        out = model.apply(params, batch, deterministic=True)
        total, g, l = _retrieval_losses(loss_obj, out, batch, valid)
        out = dict(out)
        out.pop("mlm_logits", None)  # eval doesn't score MLM; let XLA DCE it
        out["text_mask_add"] = additive_mask(batch["attention_mask"][:, 1:])
        out["text_length"] = jnp.sum(batch["attention_mask"], axis=1)
        return out, (total, g, l)

    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    # params in_sharding None = inherit the committed layout: replicated in
    # the default data-parallel case, column/row TP layouts when the state
    # was created on a model>1 mesh (forcing `rep` here made every TP run
    # crash at its first validation — jit rejects committed-vs-declared
    # sharding mismatches)
    return jax.jit(step, in_shardings=(None, dat), out_shardings=(dat, rep))


def make_qa_train_step(model, loss_obj, tx, mesh, state_sharding=None) -> Callable:
    """state_sharding: optional TrainState-shaped NamedSharding pytree
    (parallel/tp.py) for tensor-parallel layouts; None = replicated."""
    def step(state: TrainState, batch, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply(
                params, batch, deterministic=False, rngs={"dropout": rng}
            )
            logits = out["logits"]
            loss = loss_obj(logits, batch["label"])
            correct = jnp.sum(
                (jnp.argmax(logits, axis=-1) == batch["label"]).astype(jnp.float32)
            )
            return loss, correct

        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "correct": correct}

    rep = replicated_sharding(mesh)
    dat = batch_sharding(mesh)
    st = state_sharding if state_sharding is not None else rep
    return jax.jit(
        step,
        in_shardings=(st, dat, None, None),
        out_shardings=(st, rep),
        donate_argnums=(0,),
    )


def make_qa_eval_step(model, mesh) -> Callable:
    def step(params, batch):
        out = model.apply(params, batch, deterministic=True)
        return out["logits"]

    dat = batch_sharding(mesh)
    # None = inherit committed param layout (TP-safe; see retrieval eval)
    return jax.jit(step, in_shardings=(None, dat), out_shardings=dat)


def make_mc_eval_step_batched(
    model, loss_obj, mesh, n_options: int = 5
) -> Callable:
    """B multiple-choice items per dispatch, sharded over the mesh's 'data'
    axis — the TPU-first replacement for the reference's bs=1 MC eval
    (configs/ft/msrvtt_mc-select.json + trainer/trainer_dist.py:810-829),
    which under SPMD would replicate the same batch-1 forward on every chip.

    Inputs are (B, n_options, ...) host arrays: item axis sharded, option
    axis local to a device, so the (flattened) tower forward runs B*n_opt
    rows in parallel and each item's (n_opt, n_opt) global+local score
    matrix is computed device-locally (vmapped get_sim — NO cross-item
    pairs, unlike flattening into one (B*n_opt)^2 call). Per item the
    scored row is [0] with the reference's gsim+lsim orientation quirk —
    identical math to make_mc_eval_step item by item (equality-tested in
    tests/test_mc_batched.py). Returns (B, n_options) scores."""

    def step(params, batch):
        B, n_opt = batch["input_ids"].shape[:2]
        flat = {k: v.reshape((B * n_opt,) + v.shape[2:]) for k, v in batch.items()}
        out = model.apply(params, flat, deterministic=True)

        def by_item(x):
            return x.reshape((B, n_opt) + x.shape[1:])

        g_t = by_item(out["global_text_embeddings"]).astype(jnp.float32)
        g_o = by_item(out["global_object_embeddings"]).astype(jnp.float32)
        # per-item sim_matrix (same eps-floored cosine as ops/similarity)
        eps = 1e-8
        g_t = g_t / jnp.maximum(
            jnp.linalg.norm(g_t, axis=-1, keepdims=True), eps
        )
        g_o = g_o / jnp.maximum(
            jnp.linalg.norm(g_o, axis=-1, keepdims=True), eps
        )
        gsim = jnp.einsum("bod,bpd->bop", g_t, g_o)

        text_mask = additive_mask(flat["attention_mask"][:, 1:])
        lsim = jax.vmap(
            lambda im, s, im_mask, s_mask: loss_obj.local_loss.get_sim(
                im, s, im_mask, None, s_mask
            )
        )(
            by_item(out["local_object_embeddings"]),
            by_item(out["local_text_embeddings"]),
            by_item(out["object_mask"]),
            by_item(text_mask),
        )
        sims = gsim + lsim  # (B, n_opt, n_opt); row 0 = the real video
        return sims[:, 0, :]

    dat = batch_sharding(mesh)
    # params None = inherit committed layout (TP-safe; see retrieval eval)
    return jax.jit(step, in_shardings=(None, dat), out_shardings=dat)


def make_mc_eval_step(model, loss_obj, mesh, n_options: int = 5) -> Callable:
    """One video x n_options texts -> per-option scores (global + local sim,
    reference trainer/trainer_dist.py:810-829). Replicated (batch=1 path) —
    see make_mc_eval_step_batched for the sharded production path."""

    def step(params, batch):
        out = model.apply(params, batch, deterministic=True)
        gsim = sim_matrix(
            out["global_text_embeddings"], out["global_object_embeddings"]
        )
        text_mask = additive_mask(batch["attention_mask"][:, 1:])
        lsim = loss_obj.local_loss.get_sim(
            out["local_object_embeddings"],
            out["local_text_embeddings"],
            out["object_mask"],
            None,
            text_mask,
        )
        sims = gsim + lsim  # (n_opt, n_opt); row 0 = the real video
        return sims[0]

    rep = replicated_sharding(mesh)
    # params None = inherit committed layout (TP-safe; see retrieval eval)
    return jax.jit(step, in_shardings=(None, rep), out_shardings=rep)
