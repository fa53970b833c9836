"""Length-grouped batching throughput: measures the flagship pre-train step
over ONE EPOCH of realistically distributed caption lengths, grouped vs
ungrouped (data/loader.py length_grouped + trainer.text_buckets).

Why a separate bench: bench.py uses a fixed text length; the win of
text_buckets depends on the LONGEST caption in each batch, so it can only
be measured against a length DISTRIBUTION (long-tail synthetic captions,
~12-word median — data/datasets/synthetic.py caption_style='long_tail').
Both variants run the identical jitted train step (same construction as
bench.py); only batch composition differs. All bucket shapes are
pre-compiled before timing, batches are pre-tokenized and pre-assembled on
the host, so the number isolates step throughput — the loader cost is
identical for both variants by construction.

Prints one JSON line: pairs/s/chip grouped vs ungrouped, speedup, and the
per-bucket batch shares. Env: BENCH_BATCH (128), BENCH_NBATCH (32),
BENCH_SEED (0).

Reference envelope being beaten: fixed pad-to-100 batches
(/root/reference/configs/pt/o2t-cl-local-select-loss-cc.json:38,66 +
trainer/trainer_dist.py:135-137).
"""
from __future__ import annotations

import json
import os
import time
from collections import Counter

import numpy as np


def main() -> None:
    from demovlp_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    from demovlp_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from demovlp_tpu.data.datasets import dataset_object_loader
    from demovlp_tpu.data.loader import RegionDataLoader
    from demovlp_tpu.data.tokenizer import SimpleTokenizer
    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train import make_optimizer
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.train.steps import (make_retrieval_train_step,
                                         parse_text_buckets, prepare_batch)
    from demovlp_tpu.utils.prng import fast_prng_key

    os.environ.setdefault("DEMOVLP_PRNG", "rbg")
    b = int(os.environ.get("BENCH_BATCH", 128))
    n_batches = int(os.environ.get("BENCH_NBATCH", 32))
    f, k = 1, 30
    n_dev = len(jax.devices())
    global_b = b * n_dev
    buckets = parse_text_buckets({"text_buckets": [32, 48, 64]})
    tok = SimpleTokenizer(max_length=100)

    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": f, "object_num": k,
            "num_samples": global_b * n_batches,
            "caption_style": "long_tail",
        },
        split="train",
    )

    def assemble(grouped: bool):
        loader = RegionDataLoader(
            ds, batch_size=global_b, shuffle=True, num_workers=8,
            drop_last=True, seed=int(os.environ.get("BENCH_SEED", 0)),
            process_index=0, process_count=1, length_grouped=grouped,
        )
        out = []
        for data in loader:
            arrays = prepare_batch(data, tok, text_buckets=buckets)
            arrays.pop("label", None)
            out.append(arrays)
        return out

    model = ObjectRelation(
        object_num=k, num_frames=f, dtype=jnp.bfloat16,
        text_config=DistilBertConfig(), attn_impl="dense",
    )
    loss = GlobalLocalLoss(
        use_local=True, use_global=True, coef=1.0, focal_type="equal",
        local_dtype="bfloat16",
    )
    tx = make_optimizer(lr=1e-5)
    mesh = create_mesh()
    plain_batches = assemble(False)  # assembled once; batch 0 doubles as the init probe
    probe = plain_batches[0]
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0), probe))
    step = make_retrieval_train_step(model, loss, tx, mesh)
    rng = fast_prng_key(0)

    # pre-compile every bucket shape once (64 is skipped if no batch needs
    # it; the fixed 100 shape is the no-bucket-fits fallback)
    gen = np.random.RandomState(0)

    def dummy(tl):
        return shard_batch({
            "input_ids": gen.randint(1, 30000, size=(global_b, tl)).astype(np.int32),
            "attention_mask": np.ones((global_b, tl), np.int32),
            "object": gen.randn(global_b, f, k, 2054).astype(np.float32),
            "object_mask": np.ones((global_b, f, k), np.float32),
        }, mesh)

    state = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
    for tl in list(buckets) + [100]:
        state, m = step(state, dummy(tl), 1e-5, rng)
    float(m["loss"])

    def run(batches) -> tuple[float, Counter]:
        shares = Counter(bt["input_ids"].shape[1] for bt in batches)
        sharded = [shard_batch(bt, mesh) for bt in batches]
        state = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
        # warm every distinct shape with a REAL batch: the dummy-batch
        # precompile above is not enough on the remote backend — the
        # per-shape executable load happens on first live execution and
        # would otherwise land inside the timed loop (measured: it
        # dominated the mixed-shape ungrouped arm)
        seen: set[int] = set()
        for sb in sharded:
            tl = sb["input_ids"].shape[1]
            if tl not in seen:
                seen.add(tl)
                state, m = step(state, sb, 1e-5, rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for sb in sharded:
            state, m = step(state, sb, 1e-5, rng)
        float(m["loss"])  # host fetch = the only reliable fence (bench.py)
        dt = time.perf_counter() - t0
        return global_b * len(batches) / dt / n_dev, shares

    grouped_batches = assemble(True)
    plain, plain_shares = run(plain_batches)
    grouped, grouped_shares = run(grouped_batches)
    print(json.dumps({
        "metric": "lengrouped_pretrain_pairs_per_sec_per_chip",
        "grouped": round(grouped, 2),
        "ungrouped": round(plain, 2),
        "speedup": round(grouped / plain, 3),
        "unit": f"pairs/s/chip (b={b},f={f},k={k},bf16,long_tail captions)",
        "bucket_shares_grouped": dict(sorted(grouped_shares.items())),
        "bucket_shares_ungrouped": dict(sorted(plain_shares.items())),
    }))


if __name__ == "__main__":
    main()
