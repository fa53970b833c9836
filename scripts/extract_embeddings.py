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
    from demovlp_tpu.cli.common import (build_mesh, build_model,
                                        build_optimizer, build_tokenizer_from_config,
                                        init_dataloaders, load_pretrained_params)
    from demovlp_tpu.train.checkpoint import CheckpointManager
    from demovlp_tpu.train.state import create_train_state

    mesh = build_mesh(config)
    tokenizer = build_tokenizer_from_config(config)
    _, val_loaders = init_dataloaders(config, val_split=args.split)
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
    state = create_train_state(
        model, build_optimizer(config), template, jax.random.PRNGKey(0), mesh
    )
    state = load_pretrained_params(config, state)
    if args.resume:
        state, _ = CheckpointManager(Path(args.resume).parent).restore(
            args.resume, state
        )

    embed_step = serve.make_embed_step(model, mesh)
    loss_args = config["loss"].get("args", {})
    out_path = Path(args.output)
    for dl_idx, dl in enumerate(val_loaders):
        cat, meta = serve.embed_loader(
            embed_step, state.params, dl, tokenizer, mesh
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
            sims = serve.combined_sims(
                cat,
                mesh,
                use_local=loss_args.get("use_local", True),
                lambda_softmax=float(loss_args.get("lambda_softmax", 20.0)),
                focal_type=loss_args.get("focal_type", "equal"),
                segment=int(config.get("eval", {}).get("local_sim_segment", 64)),
                backend=config.get("eval", {}).get("xattn_backend", "auto"),
                mscoco_dedup=str(config["name"]).startswith("MSCOCO"),
            )
            results = serve.topk_retrieval(
                sims, k=args.topk, query_meta=meta, gallery_meta=meta
            )
            if args.results and jax.process_index() == 0:
                rp = Path(args.results)
                if len(val_loaders) > 1:
                    rp = rp.with_stem(f"{rp.stem}_{dl_idx}")
                rp.write_text(json.dumps(results, indent=1))
                print(f"[extract] wrote top-{args.topk} results -> {rp}")


if __name__ == "__main__":
    main()
