#!/usr/bin/env python
"""Extract embeddings / build a retrieval index from a trained checkpoint.

    python scripts/extract_embeddings.py -c configs/ft/msrvtt_o2t-select.json \
        -r exps/models/<run>/<stamp>/checkpoint-epochN \
        --split test --output emb.npz --topk 10 --results results.json

Standalone serving surface (demovlp_tpu/serve.py): embeds every sample of
the config's dataset split once — jit-compiled, sharded over the device
mesh, multi-host safe — then optionally scores the full global+local
similarity matrix and writes per-caption top-k retrieval results. The
checkpoint can be an orbax dir (trainer checkpoint or params-only), or the
config's arch.args.load_checkpoint may point at a reference .pth (converted
on the fly). The reference has no equivalent: its embeddings only exist
transiently inside a trainer validation epoch (trainer/trainer_dist.py:
205-408).
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demovlp_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()


def main() -> None:
    from demovlp_tpu.config import ConfigParser, build_argparser

    parser = build_argparser()
    parser.add_argument("--split", default="test", help="dataset split")
    parser.add_argument("--output", default="embeddings.npz",
                        help="npz path for the gathered embeddings")
    parser.add_argument("--topk", type=int, default=0,
                        help="also score sims and keep top-k per caption")
    parser.add_argument("--results", default="",
                        help="JSON path for the top-k retrieval results")
    args = parser.parse_args()
    config = ConfigParser(args, test=True)

    import jax
    import numpy as np

    from demovlp_tpu import serve
    from demovlp_tpu.cli.common import (build_loss, build_mesh, build_model,
                                        build_serving_params,
                                        build_tokenizer_from_config,
                                        init_dataloaders)

    mesh = build_mesh(config)
    tokenizer = build_tokenizer_from_config(config)
    _, val_loaders = init_dataloaders(config, val_split=args.split, train=False)
    model = build_model(config, mesh)

    dl = val_loaders[0]
    ds = dl.dataset
    template = {
        "input_ids": np.zeros((dl.batch_size, 100), np.int32),
        "attention_mask": np.ones((dl.batch_size, 100), np.int32),
        "object": np.zeros(
            (dl.batch_size, ds.segments, ds.object_num, 2054), np.float32
        ),
        "object_mask": np.ones(
            (dl.batch_size, ds.segments, ds.object_num), np.float32
        ),
    }
    params = build_serving_params(config, model, template, mesh, args.resume)

    embed_step = serve.make_embed_step(model, mesh)
    # score EXACTLY as the trainer does: build the loss object and read the
    # local-loss knobs off it (train/retrieval.py uses
    # self.loss.local_loss.{lambda_softmax,focal_type}) — a config omitting
    # loss.args.focal_type must serve with the loss-class default ('prob')
    loss = build_loss(config)
    local_loss = getattr(loss, "local_loss", None)
    use_local = bool(getattr(loss, "use_local", False)) and local_loss is not None
    mscoco_dedup = str(config["name"]).startswith("MSCOCO")
    out_path = Path(args.output)
    import time

    # bf16-compute models cast region features on device anyway; casting on
    # the host instead halves the H2D bytes of the dominant input tensor
    # (bit-identical — see serve.embed_loader)
    import jax.numpy as jnp

    transfer_dtype = (
        jnp.bfloat16
        if config.get("precision", {}).get("compute") == "bfloat16"
        else None
    )
    for dl_idx, dl in enumerate(val_loaders):
        t0 = time.perf_counter()
        cat, meta = serve.embed_loader(
            embed_step, params, dl, tokenizer, mesh,
            transfer_dtype=transfer_dtype,
        )
        dt = time.perf_counter() - t0
        n_vid = int(cat["g_t"].shape[0])
        print(
            f"[extract] embedded {n_vid} samples in {dt:.2f}s "
            f"({n_vid / dt:.1f} videos/s)"
        )
        if jax.process_index() == 0:
            path = (
                out_path
                if len(val_loaders) == 1
                else out_path.with_stem(f"{out_path.stem}_{dl_idx}")
            )
            np.savez(
                path,
                **cat,
                paths=np.asarray(meta["paths"]),
                raw_captions=np.asarray(meta["raw_captions"]),
            )
            print(f"[extract] wrote {cat['g_t'].shape[0]} samples -> {path}")
        if args.topk:
            t0 = time.perf_counter()
            sims = serve.combined_sims(
                cat,
                mesh,
                use_local=use_local,
                lambda_softmax=float(
                    getattr(local_loss, "lambda_softmax", 20.0)
                ),
                focal_type=getattr(local_loss, "focal_type", "prob"),
                segment=int(config.get("eval", {}).get("local_sim_segment", 64)),
                backend=config.get("eval", {}).get("xattn_backend", "auto"),
                mscoco_dedup=mscoco_dedup,
            )
            # under MSCOCO dedup the sims columns index the every-5th-row
            # gallery (trainer/trainer_dist.py:365-368): dedupe the gallery
            # metadata to match, then map indices back to saved-npz rows
            gallery_meta = (
                {k: v[::5] for k, v in meta.items()} if mscoco_dedup else meta
            )
            results = serve.topk_retrieval(
                sims, k=args.topk, query_meta=meta, gallery_meta=gallery_meta
            )
            print(
                f"[extract] scored {sims.shape[0]}x{sims.shape[1]} sims + "
                f"top-{args.topk} index in {time.perf_counter() - t0:.2f}s"
            )
            if mscoco_dedup:
                for r in results:
                    r["topk_indices"] = [5 * i for i in r["topk_indices"]]
            if args.results and jax.process_index() == 0:
                rp = Path(args.results)
                if len(val_loaders) > 1:
                    rp = rp.with_stem(f"{rp.stem}_{dl_idx}")
                rp.write_text(json.dumps(results, indent=1))
                print(f"[extract] wrote top-{args.topk} results -> {rp}")


if __name__ == "__main__":
    main()
