#!/usr/bin/env python
"""Export a demovlp_tpu orbax checkpoint to a reference-schema PyTorch .pth.

    python scripts/export_checkpoint.py \
        --src exps/.../models/<run>/<stamp>/checkpoint-epochN --dst model.pth

Accepts either a trainer checkpoint (a TrainState tree: params + optimizer
state; the optimizer state is dropped — the reference's transfer-load path
re-initializes it anyway) or a params-only directory made by
scripts/convert_checkpoint.py (`<dir>/params`). The output loads into the
reference's torch stack via its normal checkpoint path
(base/base_trainer.py _resume_checkpoint / model/model.py:49-62), so a model
trained here can be evaluated with the reference's own tooling.

The restore is topology-free: leaves are read as host numpy arrays straight
from the array store, so a checkpoint written on an N-device mesh exports on
any machine (no need to recreate the mesh).
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


def restore_numpy_tree(path: Path, params_only: bool = False):
    """Orbax restore with every leaf as a host np.ndarray, regardless of the
    device topology the checkpoint was saved under.

    params_only=True prunes the optimizer state (AdamW mu/nu — ~2x the
    params bytes in a TrainState checkpoint) from the restore target, so the
    export reads only the weights it keeps. Orbax restores the requested
    subtree only; missing siblings are simply not read."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    from orbax.checkpoint._src.metadata import value as vmeta

    ckptr = ocp.PyTreeCheckpointer()
    md = ckptr.metadata(path).item_metadata.tree
    kwargs = {}
    if params_only and isinstance(md, dict) and "opt_state" in md and "params" in md:
        md = {"params": md["params"]}
        kwargs["partial_restore"] = True
    is_leaf = lambda x: isinstance(x, vmeta.Metadata)  # noqa: E731
    target = jax.tree.map(lambda m: np.zeros(m.shape, m.dtype), md, is_leaf=is_leaf)
    rargs = jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target)
    return ckptr.restore(path, item=target, restore_args=rargs, **kwargs)


def extract_params(tree) -> dict:
    """TrainState tree (full or params-only-pruned) or a bare params tree
    -> {'params': {...}}."""
    t = tree
    if "params" in t and ("opt_state" in t or set(t) == {"params"}):
        t = t["params"]
    if isinstance(t, dict) and set(t) == {"params"}:
        return t
    return {"params": t}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--src", required=True,
        help="orbax checkpoint dir (checkpoint-epochN / model_best / "
        "convert_checkpoint.py output)",
    )
    ap.add_argument("--dst", required=True, help="output .pth path")
    ap.add_argument(
        "--arch", default=None,
        help="arch name for the wrapper (default: from meta.json, else "
        "ObjectRelation)",
    )
    args = ap.parse_args()

    from demovlp_tpu.convert import save_reference_checkpoint

    src = Path(args.src).absolute()
    # convert_checkpoint.py layout keeps the tree under <dir>/params
    ckpt_dir = src / "params" if (src / "params" / "_METADATA").exists() else src
    tree = restore_numpy_tree(ckpt_dir, params_only=True)
    params = extract_params(tree)

    meta_file = src / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    save_reference_checkpoint(
        args.dst,
        params,
        arch=args.arch or meta.get("arch") or "ObjectRelation",
        epoch=int(meta.get("epoch", 0)),
        config=meta.get("config") or {},
        monitor_best=float(meta.get("monitor_best", 0.0)),
    )
    n = len(params["params"])
    print(f"exported {src} -> {args.dst} (top-level modules: {n})")


if __name__ == "__main__":
    main()
