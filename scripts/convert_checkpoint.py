#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint to a demovlp_tpu orbax checkpoint.

    python scripts/convert_checkpoint.py \
        --src exps/.../model_best.pth --dst converted_ckpt \
        --num-frames 8 [--temporal-fix zeros|interp|bilinear]

The converted directory can be passed to `-r/--resume` or used as
`arch.args.load_checkpoint` (params only; optimizer state is re-initialized,
matching the reference's transfer-loading path, model/model.py:49-62).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pure host work: JAX_PLATFORMS=cpu must win over a plugin-pinned jax.config
from demovlp_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="reference .pth checkpoint")
    ap.add_argument("--dst", required=True, help="output orbax dir")
    ap.add_argument("--num-frames", type=int, required=True)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--text-layers", type=int, default=6)
    ap.add_argument(
        "--temporal-fix", default="zeros", choices=["zeros", "interp", "bilinear"]
    )
    args = ap.parse_args()

    import orbax.checkpoint as ocp

    from demovlp_tpu.convert import load_reference_checkpoint

    params = load_reference_checkpoint(
        args.src,
        num_frames=args.num_frames,
        depth=args.depth,
        n_text_layers=args.text_layers,
        temporal_fix=args.temporal_fix,
    )
    dst = Path(args.dst).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dst / "params", params)
    ckptr.wait_until_finished()
    (dst / "meta.json").write_text(
        json.dumps({"source": str(args.src), "num_frames": args.num_frames})
    )
    print(f"converted -> {dst}/params")


if __name__ == "__main__":
    main()
