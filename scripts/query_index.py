#!/usr/bin/env python
"""Free-text top-k video retrieval against a prebuilt embedding index.

    python scripts/extract_embeddings.py -c CFG -r CKPT --output emb.npz
    python scripts/query_index.py -c CFG -r CKPT --index emb.npz \
        --query "a man cooking pasta" --query "a dog catches a frisbee" \
        -k 5 --output results.json

Completes the serving loop (extract -> index -> query): tokenizes ad-hoc
query strings exactly as the trainer does, runs the TEXT TOWER ONLY
(jitted, mesh-sharded — serve.make_text_embed_step), scores them against
the index's video embeddings exactly as the trainer scores eval (global
cosine + mesh-sharded local cross-attention sims, scoring knobs read off
the built loss object), and prints/writes top-k video paths per query.
The reference has no equivalent: retrieving with a trained DemoVLP model
means re-running a full trainer validation epoch over a paired dataset
(trainer/trainer_dist.py:205-408) — ad-hoc text queries are impossible.

No dataset is constructed: the video-side gallery comes entirely from the
index npz (the template's frame count is derived from its o_mask shape),
so querying needs only the config, the checkpoint, and the index file.
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
    parser.add_argument("--index", required=True,
                        help="embeddings npz from scripts/extract_embeddings.py")
    parser.add_argument("--query", action="append", default=[],
                        help="query string (repeatable)")
    parser.add_argument("--queries-file", default="",
                        help="file with one query per line")
    parser.add_argument("-k", "--topk", type=int, default=10)
    parser.add_argument("--output", default="",
                        help="JSON path for the results (default: stdout)")
    args = parser.parse_args()
    config = ConfigParser(args, test=True)

    import jax
    import numpy as np

    from demovlp_tpu import serve
    from demovlp_tpu.cli.common import (build_loss, build_mesh, build_model,
                                        build_serving_params,
                                        build_tokenizer_from_config)

    queries = list(args.query)
    if args.queries_file:
        queries += [
            line.strip()
            for line in Path(args.queries_file).read_text().splitlines()
            if line.strip()
        ]
    if not queries:
        parser.error("no queries: pass --query and/or --queries-file")

    mesh = build_mesh(config)
    tokenizer = build_tokenizer_from_config(config)
    model = build_model(config, mesh)
    gallery, gallery_meta = serve.load_index(args.index)

    # params init needs a full-batch template; the video-side dims come from
    # the index itself (o_mask is the additive CLS-trimmed (N, F*K) mask)
    obj_p = config["arch"].get("args", {}).get("object_params", {})
    object_num = int(obj_p.get("object_num", 30))
    if "o_mask" in gallery:
        segments = max(1, gallery["o_mask"].shape[1] // object_num)
    else:
        # global-only index (load_index tolerates missing local keys):
        # fall back to the config's arch frame count for the init template
        segments = int(obj_p.get("num_frames", 4))
    bs = 8
    template = {
        "input_ids": np.zeros((bs, 100), np.int32),
        "attention_mask": np.ones((bs, 100), np.int32),
        "object": np.zeros((bs, segments, object_num, 2054), np.float32),
        "object_mask": np.ones((bs, segments, object_num), np.float32),
    }
    params = build_serving_params(config, model, template, mesh, args.resume)

    # score EXACTLY as the trainer does (same contract as the extract CLI):
    # knobs come off the built loss object, so a config omitting
    # loss.args.focal_type queries with the loss-class default ('prob')
    loss = build_loss(config)
    local_loss = getattr(loss, "local_loss", None)
    use_local = (
        bool(getattr(loss, "use_local", False))
        and local_loss is not None
        and "l_o" in gallery
    )
    text_step = serve.make_text_embed_step(model, mesh)
    import time

    t0 = time.perf_counter()
    results = serve.query_retrieval(
        text_step, params, queries, tokenizer, gallery, mesh,
        k=args.topk,
        use_local=use_local,
        lambda_softmax=float(getattr(local_loss, "lambda_softmax", 20.0)),
        focal_type=getattr(local_loss, "focal_type", "prob"),
        segment=int(config.get("eval", {}).get("local_sim_segment", 64)),
        backend=config.get("eval", {}).get("xattn_backend", "auto"),
        mscoco_dedup=str(config["name"]).startswith("MSCOCO"),
        # gate on the key topk_retrieval actually consumes — an index with
        # raw_captions but no paths must not pass a truthy meta dict
        gallery_meta=(
            gallery_meta if gallery_meta and "paths" in gallery_meta else None
        ),
    )
    dt = time.perf_counter() - t0
    if jax.process_index() == 0:
        print(
            f"[query] {len(queries)} queries x {gallery['g_o'].shape[0]} "
            f"gallery videos in {dt:.2f}s"
        )
        if args.output:
            Path(args.output).write_text(json.dumps(results, indent=1))
            print(f"[query] wrote top-{args.topk} results -> {args.output}")
        else:
            print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
