"""Flax -> PyTorch weight export (the inverse of convert/torch_import.py).

Produces a state dict in the reference model's EXACT key schema
(model/model.py ObjectRelation / ObjectQARelation; model/object_transformer.py
ObjectTransformer; model/video_qa_mdoel.py BUTD head), so a model trained in
this framework can be loaded back into the reference's torch stack
(`load_state_dict`) for independent evaluation — and `save_reference_checkpoint`
wraps it in the reference's `_save_checkpoint` schema
(base/base_trainer.py:176-200: {arch, epoch, state_dict, optimizer,
monitor_best, config}) so the reference's own `--resume`/test tooling accepts
the file.

Params the reference model CREATES but never APPLIES — the final
`object_model.norm` LayerNorm (object_transformer.py:354,437-452) and each
block's `norm3` when there is no time module (:245, applied only at :253) —
do not exist in our param tree and are synthesized at their torch init values
(LayerNorm weight=1, bias=0) so `load_state_dict` is total.

Conventions are the exact inverses of torch_import: flax Dense kernel
(in, out) -> torch Linear weight (out, in); WeightNormDense {g (), v (in,out)}
-> {weight_g (), weight_v (out,in)} (torch weight_norm(dim=None) keeps a
scalar g); LayerNorm {scale, bias} under LayerNorm_0 -> {weight, bias}.
Pure numpy; torch is only required by save_reference_checkpoint.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    """Leaf -> float32 numpy (bf16 leaves have no torch-loadable numpy dtype)."""
    a = np.asarray(x)
    if a.dtype != np.float32:
        a = a.astype(np.float32)
    return np.ascontiguousarray(a)


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(_np(x).T)


def _dense(out: Dict, tree: Dict, key: str) -> None:
    out[f"{key}.weight"] = _t(tree["kernel"])
    if "bias" in tree:
        out[f"{key}.bias"] = _np(tree["bias"])


def _ln(out: Dict, tree: Dict, key: str) -> None:
    ln = tree["LayerNorm_0"]
    out[f"{key}.weight"] = _np(ln["scale"])
    out[f"{key}.bias"] = _np(ln["bias"])


def _ln_default(out: Dict, key: str, dim: int) -> None:
    out[f"{key}.weight"] = np.ones((dim,), np.float32)
    out[f"{key}.bias"] = np.zeros((dim,), np.float32)


def _var_attention(out: Dict, tree: Dict, key: str) -> None:
    _dense(out, tree["qkv"], f"{key}.qkv")
    _dense(out, tree["proj"], f"{key}.proj")


def _wn_dense(out: Dict, tree: Dict, key: str) -> None:
    out[f"{key}.weight_g"] = _np(tree["g"]).reshape(())
    out[f"{key}.weight_v"] = _t(tree["v"])
    if "bias" in tree:
        out[f"{key}.bias"] = _np(tree["bias"])


def _fcnet(out: Dict, tree: Dict, key: str) -> None:
    # reference FCNet: weight-normed Linears at even Sequential indices
    for name, sub in tree.items():
        i = int(name[len("layer"):])
        _wn_dense(out, sub, f"{key}.main.{2 * i}")


def _export_distilbert(out: Dict, tree: Dict, prefix: str) -> None:
    p = prefix
    out[f"{p}embeddings.word_embeddings.weight"] = _np(
        tree["word_embeddings"]["embedding"]
    )
    out[f"{p}embeddings.position_embeddings.weight"] = _np(
        tree["position_embeddings"]["embedding"]
    )
    _ln(out, tree["emb_layer_norm"], f"{p}embeddings.LayerNorm")
    i = 0
    while f"layer_{i}" in tree:
        layer = tree[f"layer_{i}"]
        lp = f"{p}transformer.layer.{i}."
        for name in ("q_lin", "k_lin", "v_lin", "out_lin"):
            _dense(out, layer["attention"][name], f"{lp}attention.{name}")
        _ln(out, layer["sa_layer_norm"], f"{lp}sa_layer_norm")
        _dense(out, layer["ffn_lin1"], f"{lp}ffn.lin1")
        _dense(out, layer["ffn_lin2"], f"{lp}ffn.lin2")
        _ln(out, layer["output_layer_norm"], f"{lp}output_layer_norm")
        i += 1


def _export_object_tower(out: Dict, tree: Dict, prefix: str) -> None:
    p = prefix
    out[f"{p}cls_token"] = _np(tree["cls_token"])
    out[f"{p}custom_pos_embed"] = _np(tree["custom_pos_embed"])
    out[f"{p}temporal_embed"] = _np(tree["temporal_embed"])
    _dense(out, tree["object_embedding"], f"{p}object_embedding")
    _dense(out, tree["pos_embedding"], f"{p}pos_embedding")
    out[f"{p}proj.weight"] = _t(tree["proj"]["kernel"])
    dim = int(np.asarray(tree["cls_token"]).shape[-1])
    i = 0
    while f"blocks_{i}" in tree:
        blk = tree[f"blocks_{i}"]
        bp = f"{p}blocks.{i}."
        _ln(out, blk["norm1"], f"{bp}norm1")
        _ln(out, blk["norm2"], f"{bp}norm2")
        _var_attention(out, blk["attn"], f"{bp}attn")
        _dense(out, blk["mlp"]["fc1"], f"{bp}mlp.fc1")
        _dense(out, blk["mlp"]["fc2"], f"{bp}mlp.fc2")
        if "timeattn" in blk:
            _ln(out, blk["norm3"], f"{bp}norm3")
            _var_attention(out, blk["timeattn"], f"{bp}timeattn")
        else:
            # created-but-unused in the reference block (norm3 is only
            # applied on the timeattn path) — synthesize torch LN init
            _ln_default(out, f"{bp}norm3", dim)
        i += 1
    # the reference's never-applied final LayerNorm (we don't create it)
    _ln_default(out, f"{p}norm", dim)


def _export_qa_head(out: Dict, tree: Dict, prefix: str) -> None:
    p = prefix
    _fcnet(out, tree["v_att"]["v_proj"], f"{p}v_att.v_proj")
    _fcnet(out, tree["v_att"]["q_proj"], f"{p}v_att.q_proj")
    _wn_dense(out, tree["v_att"]["linear"], f"{p}v_att.linear")
    _fcnet(out, tree["classifier"]["q_net"], f"{p}classifier.q_net")
    _fcnet(out, tree["classifier"]["v_net"], f"{p}classifier.v_net")
    _dense(out, tree["classifier"]["main1"], f"{p}classifier.main.0")
    _dense(out, tree["classifier"]["main2"], f"{p}classifier.main.3")


def export_reference_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Flax params {'params': {...}} (ObjectRelation / ObjectQARelation /
    ObjectMCRelation) -> reference-schema state dict of float32 numpy arrays.

    Total over the reference model's parameters: round-trips through
    convert_reference_checkpoint(strict=True) and loads into the reference
    torch modules with no missing parameter keys (tests/test_torch_export.py).
    """
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    text = tree["text_tower"]
    _export_distilbert(out, text["text_model"], "text_model.")
    _dense(out, text["txt_proj"], "txt_proj.1")
    _export_object_tower(out, tree["object_model"], "object_model.")
    if "head" in tree:
        _export_qa_head(out, tree["head"], "head.")
    # params with no reference counterpart (net-new capability here, e.g. the
    # MLM head) are intentionally not exported — the reference model has no
    # keys to hold them and its load would reject unexpected entries
    return out


def save_reference_checkpoint(
    path: str,
    params: Dict,
    arch: str = "ObjectRelation",
    epoch: int = 0,
    config: Optional[Dict[str, Any]] = None,
    monitor_best: float = 0.0,
) -> None:
    """torch.save the exported weights in the reference trainer's checkpoint
    schema (base/base_trainer.py:176-200) so its --resume / test scripts and
    `state_dict_data_parallel_fix` load path accept the file."""
    import torch

    sd = {
        # .copy(): jnp-backed leaves surface as non-writable numpy views,
        # which torch.from_numpy rejects (undefined-behavior warning)
        k: torch.from_numpy(v.copy())
        for k, v in export_reference_state_dict(params).items()
    }
    torch.save(
        {
            "arch": arch,
            "epoch": epoch,
            "state_dict": sd,
            "optimizer": None,
            "monitor_best": monitor_best,
            "config": dict(config or {}),
        },
        path,
    )
