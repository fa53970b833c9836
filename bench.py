"""Headline benchmark: pre-training video-text pairs/sec/chip.

Measures the full SPMD train step (both towers forward+backward + AdamW) on
the reference's pre-train workload — 1 frame x 30 regions, global+local (RWA)
contrastive loss, ViT-B region tower + DistilBERT
(configs/pt/o2t-cl-local-select-loss-cc.json:38,66,106-107). Default per-chip
batch is 128 (matching the reference's per-device envelope; the O(B^2)
local RWA loss makes larger per-chip batches slower per pair).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.json "published": {}),
so vs_baseline is reported against this framework's round-1 recorded number
once one exists; until then 1.0.

Env knobs: BENCH_BATCH (default 128), BENCH_FRAMES (1), BENCH_REGIONS (30),
BENCH_STEPS (20), BENCH_DTYPE (bfloat16|float32, default bfloat16),
BENCH_LOCAL_DTYPE (bfloat16 default — the shipped pre-train setting),
BENCH_LOCAL_REMAT / BENCH_NORM_DTYPE / BENCH_PRNG / BENCH_ATTN (see
BENCH_NOTES.md for the measured effect of each).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


# Round-1 v5e-1 honest numbers (f=1, k=30, bfloat16; host-fetch fenced):
#   b=128: 1160 pairs/s/chip  <- default (the O(B^2) local loss favors it)
#   b=256: 746   b=512(blockwise): 462
# (Earlier recorded figures of 28k-171k were timing artifacts: on this remote
# backend block_until_ready returns before execution finishes; the bench now
# fences with a host fetch.) vs_baseline compares against the b=128 number.
ROUND1_PAIRS_PER_SEC = 1160.25


def main() -> None:
    # honor an explicit JAX_PLATFORMS over a plugin-pinned jax.config (e.g.
    # JAX_PLATFORMS=cpu bench runs while the TPU tunnel is unreachable)
    from demovlp_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()

    import jax

    # persistent, runtime-version-keyed compile cache: repeat bench runs skip
    # the (slow) TPU compile; a libtpu upgrade lands in a fresh subdir
    from demovlp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train import make_optimizer
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.train.steps import make_retrieval_train_step

    b = int(os.environ.get("BENCH_BATCH", 128))
    f = int(os.environ.get("BENCH_FRAMES", 1))
    k = int(os.environ.get("BENCH_REGIONS", 30))
    # 20-step timing window (was 10): the dispatch-amortization under-read
    # of the short window is ~1.7% at the 80 ms flagship step (round-5
    # ablation log: 1,600.0 at 10 steps vs 1,627.3 at 20, same box/session);
    # same compiled executable either way.
    steps = int(os.environ.get("BENCH_STEPS", 20))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    # ablation knobs for perf decomposition (profile_step.py-style isolated
    # jits mis-time on the remote backend; ablating the real donating step
    # is the reliable probe)
    use_local = os.environ.get("BENCH_USE_LOCAL", "1") == "1"
    text_len = int(os.environ.get("BENCH_TEXT_LEN", 100))
    obj_depth = int(os.environ.get("BENCH_OBJ_DEPTH", 12))
    text_layers = int(os.environ.get("BENCH_TEXT_LAYERS", 6))
    deterministic = os.environ.get("BENCH_DETERMINISTIC", "0") == "1"
    # rbg dropout masks (measured +12% over threefry at b=128 on v5e);
    # override with BENCH_PRNG=threefry. Scoped to the dropout key like the
    # trainers (utils/prng.py) — never a global prng-impl flip.
    # An explicit BENCH_PRNG always wins over a pre-exported DEMOVLP_PRNG
    # (setdefault alone would silently ignore the ablation request).
    if "BENCH_PRNG" in os.environ:
        os.environ["DEMOVLP_PRNG"] = os.environ["BENCH_PRNG"]
    else:
        os.environ.setdefault("DEMOVLP_PRNG", "rbg")
    from demovlp_tpu.utils.prng import fast_prng_key

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    n_dev = len(jax.devices())
    mesh = create_mesh()
    from demovlp_tpu.models.distilbert import DistilBertConfig

    # LayerNorm compute dtype (BENCH_NORM_DTYPE=float32 for reference-exact
    # norm numerics; bf16 drops the per-norm converts, see models/layers.py)
    norm_dtype = (
        jnp.bfloat16
        if os.environ.get("BENCH_NORM_DTYPE", "float32") == "bfloat16"
        else jnp.float32
    )
    model = ObjectRelation(
        object_num=k, num_frames=f, dtype=dtype, object_depth=obj_depth,
        text_config=DistilBertConfig(n_layers=text_layers),
        # "dense" = the shipped default (masked full attention; +21% at the
        # f=8 fine-tune envelope, identical fast path at f=1 — BENCH_NOTES
        # round 3). BENCH_ATTN=xla re-ablates the grouped form.
        attn_impl=os.environ.get("BENCH_ATTN", "dense"),
        norm_dtype=norm_dtype,
    )
    rng = jax.random.PRNGKey(0)       # init (threefry, like trainers)
    step_rng = fast_prng_key(0)       # dropout stream (rbg by default)
    gen = np.random.RandomState(0)
    global_b = b * n_dev
    batch = {
        "input_ids": gen.randint(1, 30000, size=(global_b, text_len)).astype(np.int32),
        "attention_mask": np.ones((global_b, text_len), np.int32),
        "object": gen.randn(global_b, f, k, 2054).astype(np.float32),
        "object_mask": np.ones((global_b, f, k), np.float32),
    }
    # keep the master params on HOST: the train step donates its state, so
    # each measure() must hand the step a fresh device copy (reusing donated
    # device buffers raises "Array has been deleted")
    params = jax.tree.map(np.asarray, model.init(rng, batch))
    block = int(os.environ.get("BENCH_LOCAL_SEGMENT", 0))
    # bf16 O(B^2) local-loss pipeline (sims/CE stay f32; ops/xattn.py) — the
    # shipped pre-train config's setting (configs/pt/...-cc.json "local_dtype"):
    # 1,458 vs 1,283 pairs/s measured on v5e (BENCH_NOTES.md round 2)
    local_dtype = os.environ.get("BENCH_LOCAL_DTYPE", "bfloat16")
    local_remat = os.environ.get("BENCH_LOCAL_REMAT", "0") == "1"
    # BENCH_MU_DTYPE=bfloat16 stores Adam's first moment in bf16 (halves its
    # slice of the 28 B/param optimizer stream); default f32 = reference
    # numerics (see train/optim.py make_optimizer)
    tx = make_optimizer(
        lr=1e-5,
        mu_dtype=os.environ.get("BENCH_MU_DTYPE"),
        # BENCH_PACK_SMALL=1 packs the ~140 tiny bias/LN leaves into one flat
        # buffer for the update — numerically exact, targets the measured
        # per-fusion overhead of the optimizer (8.9 ms vs 5.2 ms floor).
        # Values > 1 are the packing threshold in elements (e.g.
        # 1000000000 packs EVERY f32 leaf incl. the ~60 large matrices).
        pack_small=int(os.environ.get("BENCH_PACK_SMALL", "0")),
    )
    sb = shard_batch(batch, mesh)

    def measure(ld: str) -> float:
        loss = GlobalLocalLoss(
            use_local=use_local, use_global=True, coef=1.0, focal_type="equal",
            local_block_segment=block, local_dtype=ld,
            local_remat=local_remat,
        )
        state = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
        step = make_retrieval_train_step(
            model, loss, tx, mesh, deterministic=deterministic,
            # one fused f32->bf16 weight cast per step instead of per-op
            # casts. Measured a WASH on v5e at b=128 (1,465.7 on vs 1,468.9
            # off — XLA already dedups the converts), so default off =
            # the shipped trainer path; BENCH_CAST_WEIGHTS=1 re-ablates.
            cast_weights=(
                dtype_name == "bfloat16"
                and os.environ.get("BENCH_CAST_WEIGHTS", "0") == "1"
            ),
        )
        # warmup (compile + 2 steps). NOTE: sync by FETCHING the loss scalar
        # — on remote-execution backends block_until_ready can return while
        # the computation is still in flight; a host fetch is the only
        # reliable fence.
        state, m = step(state, sb, 1e-5, step_rng)
        state, m = step(state, sb, 1e-5, step_rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, sb, 1e-5, step_rng)
        float(m["loss"])  # forces the whole state-dependency chain to finish
        dt = time.perf_counter() - t0
        return global_b * steps / dt / n_dev

    per_chip = measure(local_dtype)
    vs = per_chip / ROUND1_PAIRS_PER_SEC if ROUND1_PAIRS_PER_SEC else 1.0
    out = {
        "metric": "pretrain_pairs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": (
            f"pairs/s/chip (b={b},f={f},k={k},{dtype_name},"
            f"local={local_dtype})"
        ),
        "vs_baseline": round(vs, 3),
    }
    # absolute efficiency: MFU = per-chip flops/s over peak bf16 — the
    # BASELINE.json "speed-of-light" target tracked by the artifact itself
    # (utils/flops.py). Flops from XLA's cost analysis of the ACTUAL
    # compiled step (fwd+bwd+AdamW), analytic-model fallback + cross-check.
    try:
        from demovlp_tpu.utils import flops as flops_mod

        loss_for_mfu = GlobalLocalLoss(
            use_local=use_local, use_global=True, coef=1.0,
            focal_type="equal", local_block_segment=block,
            local_dtype=local_dtype, local_remat=local_remat,
        )
        step_for_mfu = make_retrieval_train_step(
            model, loss_for_mfu, tx, mesh, deterministic=deterministic,
        )
        state0 = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
        step_flops = flops_mod.compiled_step_flops(
            step_for_mfu, state0, sb, 1e-5, step_rng, num_partitions=n_dev
        )
        model_flops = flops_mod.retrieval_step_flops_model(
            global_b, f, k, text_len, obj_depth=obj_depth,
            text_layers=text_layers, use_local=use_local,
        )
        basis = "xla_cost_analysis" if step_flops else "analytic_model"
        step_flops = step_flops or model_flops
        steps_per_sec = per_chip / b  # pairs/s/chip over pairs/chip/step
        eff = flops_mod.mfu(
            (step_flops / n_dev) * steps_per_sec, jax.devices()[0]
        )
        out["step_gflops"] = round(step_flops / 1e9, 1)
        out["model_gflops"] = round(model_flops / 1e9, 1)
        out["mfu_basis"] = basis
        if eff is not None:
            out["mfu"] = round(eff, 4)
        else:
            out["mfu"] = None  # unknown peak (CPU test backend)
    except Exception as e:  # pragma: no cover - defensive
        out["mfu_error"] = f"{type(e).__name__}: {e}"
    # typical-band secondary: the same step at text_len=32, the bucket
    # most real (10-15 token) caption batches land in under the shipped
    # -fast config's text_buckets + length_grouped (BENCH_NOTES round 4:
    # 28/32 long-tail epoch batches; epoch-level A/B in bench_lengrouped.py).
    # BENCH_FAST_BAND=0 skips it.
    if (
        text_len == 100
        and os.environ.get("BENCH_FAST_BAND", "1") == "1"
    ):
        batch32 = dict(batch)
        batch32["input_ids"] = batch["input_ids"][:, :32]
        batch32["attention_mask"] = batch["attention_mask"][:, :32]
        sb, sb_full = shard_batch(batch32, mesh), sb
        out["fast_band_value"] = round(measure(local_dtype), 2)
        out["fast_band_unit"] = "pairs/s/chip at text_len=32 (see unit)"
        sb = sb_full
    # dual headline: also report the reference-exact-numerics (f32 local
    # loss) throughput so the perf claim and the reference-numerics claim
    # stay separable (BENCH_DUAL=0 skips the second measurement)
    if local_dtype != "float32" and os.environ.get("BENCH_DUAL", "1") == "1":
        out["f32_exact_value"] = round(measure("float32"), 2)
    # secondary task envelopes (QA train step, MC eval single vs batched) —
    # BENCH_TASKS=0 skips them for quick iteration runs. A failure here
    # (e.g. OOM initializing the second f=8 model while the retrieval
    # buffers are still live) must not destroy the already-measured
    # primary numbers, so it degrades to an error field.
    if os.environ.get("BENCH_TASKS", "1") == "1":
        try:
            import bench_tasks

            out.update(bench_tasks.run_all())
        except Exception as e:  # pragma: no cover - defensive
            out["tasks_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
