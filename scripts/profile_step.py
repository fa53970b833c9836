#!/usr/bin/env python
"""Per-component wall-clock breakdown of the pre-train step on the live
backend (host-fetch fenced; block_until_ready does not fence on the remote
axon backend). Produces the BENCH_NOTES per-op table.

Env: PROF_BATCH (128), PROF_FRAMES (1), PROF_REGIONS (30), PROF_STEPS (10),
PROF_DTYPE (bfloat16), DEMOVLP_XATTN_BACKEND (xla|pallas).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

from demovlp_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, steps=10):
    out = fn(*args)
    out = fn(*args)
    np.asarray(jax_leaf(out))  # fence
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def jax_leaf(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0].ravel()[:1]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    b = int(os.environ.get("PROF_BATCH", 128))
    f = int(os.environ.get("PROF_FRAMES", 1))
    k = int(os.environ.get("PROF_REGIONS", 30))
    steps = int(os.environ.get("PROF_STEPS", 10))
    dtype = jnp.bfloat16 if os.environ.get("PROF_DTYPE", "bfloat16") == "bfloat16" else jnp.float32

    gen = np.random.RandomState(0)
    batch = {
        "input_ids": gen.randint(1, 30000, size=(b, 100)).astype(np.int32),
        "attention_mask": np.ones((b, 100), np.int32),
        "object": gen.randn(b, f, k, 2054).astype(np.float32),
        "object_mask": np.ones((b, f, k), np.float32),
    }
    model = ObjectRelation(object_num=k, num_frames=f, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch)
    loss_obj = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                               focal_type="equal")

    from demovlp_tpu.ops.masking import additive_mask
    from demovlp_tpu.ops.similarity import sim_matrix

    def losses(out, batch):
        f32 = lambda x: x.astype(jnp.float32)
        gsim = sim_matrix(
            f32(out["global_text_embeddings"]), f32(out["global_object_embeddings"])
        )
        tmask = additive_mask(batch["attention_mask"][:, 1:])
        tlen = jnp.sum(batch["attention_mask"], axis=1)
        total, g, l = loss_obj(
            gsim, f32(out["local_object_embeddings"]),
            f32(out["local_text_embeddings"]), out["object_mask"], tlen, tmask,
        )
        return total

    rows = []

    # 1. towers forward only
    fwd = jax.jit(lambda p, bt: model.apply(p, bt, deterministic=True))
    rows.append(("towers fwd", _bench(fwd, params, batch, steps=steps)))

    # 2. towers fwd+bwd (sum-of-embeddings pseudo-loss, no xattn)
    def tower_loss(p, bt):
        out = model.apply(p, bt, deterministic=True)
        return sum(jnp.sum(out[kk].astype(jnp.float32)) for kk in (
            "global_text_embeddings", "global_object_embeddings",
            "local_text_embeddings", "local_object_embeddings"))
    tgrad = jax.jit(jax.grad(tower_loss))
    rows.append(("towers fwd+bwd", _bench(tgrad, params, batch, steps=steps)))

    # 3. text tower only fwd+bwd
    def text_loss(p, bt):
        out = model.apply(
            p, bt["input_ids"], bt["attention_mask"], True,
            method=lambda m, i, a, d: m.compute_text(i, a, d),
        )
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
    rows.append(("text tower fwd+bwd",
                 _bench(jax.jit(jax.grad(text_loss)), params, batch, steps=steps)))

    # 4. region tower only fwd+bwd
    def obj_loss(p, bt):
        out = model.apply(
            p, bt["object"], bt["object_mask"], True,
            method=lambda m, o, om, d: m.compute_object(o, om, d),
        )
        return jnp.sum(out[0].astype(jnp.float32)) + jnp.sum(out[1].astype(jnp.float32))
    rows.append(("region tower fwd+bwd",
                 _bench(jax.jit(jax.grad(obj_loss)), params, batch, steps=steps)))

    # 5. loss only (fixed embeddings) fwd+bwd
    out0 = fwd(params, batch)
    out0 = {kk: jnp.asarray(v) for kk, v in out0.items()}

    def loss_only(emb):
        merged = dict(out0)
        merged.update(emb)
        return losses(merged, batch)
    emb_vars = {kk: out0[kk] for kk in
                ("global_text_embeddings", "global_object_embeddings",
                 "local_text_embeddings", "local_object_embeddings")}
    rows.append(("loss fwd+bwd (xattn=" + os.environ.get("DEMOVLP_XATTN_BACKEND", "xla") + ")",
                 _bench(jax.jit(jax.grad(lambda e: loss_only(e))), emb_vars, steps=steps)))

    # 6. full train-style value_and_grad (no optimizer)
    def full_loss(p, bt):
        out = model.apply(p, bt, deterministic=True)
        return losses(out, bt)
    rows.append(("full fwd+bwd",
                 _bench(jax.jit(jax.grad(full_loss)), params, batch, steps=steps)))

    print(f"\n== profile b={b} f={f} k={k} dtype={os.environ.get('PROF_DTYPE','bfloat16')} "
          f"backend={jax.default_backend()} xattn={os.environ.get('DEMOVLP_XATTN_BACKEND','xla')}")
    for name, ms in rows:
        print(f"{name:34s} {ms:8.2f} ms   ({b/ms*1000:8.0f} pairs/s)")


if __name__ == "__main__":
    main()
