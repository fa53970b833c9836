"""QA and MC task-envelope benchmarks (secondary bench surface).

QA: the reference fine-tune envelope — batch 64, 8 frames x 30 regions,
BUTD head over 1500 answers (configs/ft/msrvtt_qa-select.json; reference
envelope /root/reference/configs/ft/msrvtt_qa-select.json) — measured as
the full jitted train step (forward + backward + AdamW), samples/s/chip.

MC: per-item eval wall-clock for both step shapes — the reference-shaped
replicated batch-1 path (1 video x 5 options per dispatch,
/root/reference/configs/ft/msrvtt_mc-select.json runs bs=1) and the
TPU-first batched path (mesh-data-axis-sharded B items per dispatch,
train/steps.py make_mc_eval_step_batched; equality pinned by
tests/test_mc_batched.py). Reports items/s for each + the speedup.

Run standalone (`python bench_tasks.py` prints one JSON line) or via
bench.py, which embeds these numbers as secondary fields unless
BENCH_TASKS=0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _sync(x) -> float:
    # host fetch is the only reliable fence on the remote backend (bench.py)
    return float(np.asarray(x).reshape(-1)[0])


def bench_qa(mesh, steps: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from demovlp_tpu.losses.losses import CrossEntropy
    from demovlp_tpu.models import ObjectQARelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train import make_optimizer
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.train.steps import make_qa_train_step
    from demovlp_tpu.utils.prng import fast_prng_key

    b = int(os.environ.get("BENCH_QA_BATCH", 64))
    f, k, text_len, num_label = 8, 30, 100, 1500
    n_dev = len(jax.devices())
    global_b = b * n_dev
    model = ObjectQARelation(
        object_num=k, num_frames=f, num_label=num_label,
        dtype=jnp.bfloat16, attn_impl="dense",
        text_config=DistilBertConfig(),
    )
    gen = np.random.RandomState(0)
    batch = {
        "input_ids": gen.randint(1, 30000, size=(global_b, text_len)).astype(np.int32),
        "attention_mask": np.ones((global_b, text_len), np.int32),
        "object": gen.randn(global_b, f, k, 2054).astype(np.float32),
        "object_mask": np.ones((global_b, f, k), np.float32),
        "label": gen.randint(0, num_label, size=global_b).astype(np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(lr=1e-5)
    state = TrainState.create(params, tx)
    step = make_qa_train_step(model, CrossEntropy(), tx, mesh)
    sb = shard_batch(batch, mesh)
    rng = fast_prng_key(0)
    state, m = step(state, sb, 1e-5, rng)
    state, m = step(state, sb, 1e-5, rng)
    _sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, sb, 1e-5, rng)
    _sync(m["loss"])
    dt = time.perf_counter() - t0
    return {
        "qa_samples_per_sec_per_chip": round(global_b * steps / dt / n_dev, 2),
        "qa_envelope": f"b={b},f={f},k={k},labels={num_label},bf16",
    }


def bench_mc(mesh, dispatches: int = 6) -> dict:
    import jax
    import jax.numpy as jnp

    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectMCRelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train.steps import (make_mc_eval_step,
                                         make_mc_eval_step_batched)

    f, k, text_len, n_opt = 8, 30, 100, 5
    n_dev = len(jax.devices())
    B = int(os.environ.get("BENCH_MC_BATCH", 8)) * n_dev
    model = ObjectMCRelation(
        object_num=k, num_frames=f, dtype=jnp.bfloat16, attn_impl="dense",
        text_config=DistilBertConfig(),
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal")
    gen = np.random.RandomState(0)

    def item():
        return {
            "input_ids": gen.randint(
                1, 30000, size=(n_opt, text_len)
            ).astype(np.int32),
            "attention_mask": np.ones((n_opt, text_len), np.int32),
            "object": gen.randn(n_opt, f, k, 2054).astype(np.float32),
            "object_mask": np.ones((n_opt, f, k), np.float32),
        }

    one = item()
    params = model.init(jax.random.PRNGKey(0), one)

    single = make_mc_eval_step(model, loss, mesh, n_opt)
    _sync(single(params, one))  # compile
    t0 = time.perf_counter()
    for _ in range(dispatches):
        s = single(params, one)
    _sync(s)
    dt1 = time.perf_counter() - t0
    per_item_bs1 = dispatches / dt1

    batched = make_mc_eval_step_batched(model, loss, mesh, n_opt)
    group = {
        key: np.stack([item()[key] for _ in range(B)]) for key in one
    }
    sg = shard_batch(group, mesh)
    _sync(batched(params, sg))  # compile
    t0 = time.perf_counter()
    for _ in range(dispatches):
        s = batched(params, sg)
    _sync(s)
    dtb = time.perf_counter() - t0
    per_item_batched = B * dispatches / dtb
    return {
        "mc_eval_items_per_sec_bs1": round(per_item_bs1, 2),
        "mc_eval_items_per_sec_batched": round(per_item_batched, 2),
        "mc_eval_batched_speedup": round(per_item_batched / per_item_bs1, 2),
        "mc_envelope": f"B={B},opts={n_opt},f={f},k={k},bf16",
    }


def run_all() -> dict:
    from demovlp_tpu.parallel import create_mesh

    mesh = create_mesh()
    out = {}
    out.update(bench_qa(mesh))
    out.update(bench_mc(mesh))
    return out


if __name__ == "__main__":
    from demovlp_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    from demovlp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print(json.dumps(run_all()))
