#!/usr/bin/env python
"""Offline video-QA prediction from a trained checkpoint.

    python scripts/predict_qa.py -c configs/ft/msrvtt_qa-select.json \
        -r exps/models/<run>/<stamp>/checkpoint-epochN \
        --split test --output predictions.json

Serving companion to scripts/extract_embeddings.py: runs the jitted QA
eval step over the config's dataset split (mesh-sharded, multi-host safe,
every sample exactly once) and writes one {question_id, answer,
answer_text} entry per question. The reference can only produce these
transiently inside a trainer validation epoch (trainer/trainer_dist.py:
619-655).
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
    parser.add_argument("--output", default="predictions.json",
                        help="JSON path for the predictions")
    args = parser.parse_args()
    config = ConfigParser(args, test=True)

    import jax
    import numpy as np

    from demovlp_tpu import serve
    from demovlp_tpu.cli.common import (build_mesh, build_model,
                                        build_serving_params,
                                        build_tokenizer_from_config,
                                        init_dataloaders)
    from demovlp_tpu.train.steps import make_qa_eval_step

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

    eval_step = make_qa_eval_step(model, mesh)
    out_path = Path(args.output)
    # bf16-compute models: cast region features on the host, halving the
    # H2D bytes of the dominant input tensor (bit-identical — serve.py)
    import jax.numpy as jnp

    transfer_dtype = (
        jnp.bfloat16
        if config.get("precision", {}).get("compute") == "bfloat16"
        else None
    )
    for dl_idx, dl in enumerate(val_loaders):
        results = serve.predict_qa(
            eval_step, params, dl, tokenizer, mesh,
            label2ans=getattr(dl.dataset, "label2ans", None),
            transfer_dtype=transfer_dtype,
        )
        if jax.process_index() == 0:
            path = (
                out_path
                if len(val_loaders) == 1
                else out_path.with_stem(f"{out_path.stem}_{dl_idx}")
            )
            path.write_text(json.dumps(results, indent=1))
            print(f"[predict_qa] wrote {len(results)} predictions -> {path}")


if __name__ == "__main__":
    main()
