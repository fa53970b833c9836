"""PyTorch -> Flax weight conversion.

Covers the reference's three loading paths:
  1. full reference checkpoints ({'state_dict': ...} from base_trainer
     _save_checkpoint; model/model.py:49-62 load path) including the DDP
     'module.' prefix fix (utils/util.py state_dict_data_parallel_fix)
  2. temporal-embed inflation when num_frames differs between checkpoint and
     model (zeros / interp / bilinear; model/model.py:98-151)
  3. timm ViT-B/16 initialization of the region tower (non-strict load of
     cls_token + blocks; object_transformer.py:470-483)

Conventions: torch Linear weight (out, in) -> flax Dense kernel (in, out) via
transpose; packed qkv keeps [q|k|v] column order; weight_norm(dim=None)
(weight_g scalar, weight_v matrix) -> WeightNormDense {g, v}; LayerNorm
weight/bias -> scale/bias nested under the wrapper's LayerNorm_0.

This module only requires torch when actually loading a .pth file; the
mapping itself is pure numpy and unit-tested with synthetic state dicts.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


# --------------------------------------------------------------------------
def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _n(w) -> np.ndarray:
    return np.asarray(w)


def strip_dp_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove a leading 'module.' from every key if present."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def inflate_temporal_embed(
    embed: np.ndarray, target_frames: int, mode: str = "zeros"
) -> np.ndarray:
    """(1, F_load, D) -> (1, target_frames, D) (model/model.py:98-151)."""
    load_frames = embed.shape[1]
    if load_frames == target_frames:
        return embed
    if load_frames > target_frames:
        return embed[:, :target_frames, :]
    if mode == "zeros":
        out = np.zeros((embed.shape[0], target_frames, embed.shape[2]), embed.dtype)
        out[:, :load_frames] = embed
        return out
    if mode in ("interp", "bilinear"):
        # resize along the frame axis with the EXACT torch F.interpolate
        # semantics the reference uses (model/model.py:121-133): 'interp' =
        # mode='nearest' (floor(i*scale) source index), 'bilinear' =
        # mode='bilinear' with the default align_corners=False (half-pixel
        # centers). The (frames, dim) "image"'s dim axis has scale 1, so only
        # the frame axis actually resamples.
        src = embed[0].astype(np.float32)  # (F, D)
        scale = load_frames / target_frames
        if mode == "interp":
            idx = np.minimum(
                (np.arange(target_frames) * scale).astype(int), load_frames - 1
            )
            return src[idx][None].astype(embed.dtype)
        pos = np.clip(
            (np.arange(target_frames) + 0.5) * scale - 0.5, 0, load_frames - 1
        )
        lo = np.floor(pos).astype(int)
        hi = np.minimum(lo + 1, load_frames - 1)
        frac = (pos - lo)[:, None]
        return ((1 - frac) * src[lo] + frac * src[hi])[None].astype(embed.dtype)
    raise NotImplementedError(mode)


# --------------------------------------------------------------------------
def _convert_distilbert(sd: Dict, prefix: str, n_layers: int) -> Dict:
    """HF DistilBERT state dict slice -> our DistilBertModel param tree."""
    p = prefix
    out = {
        "word_embeddings": {
            "embedding": _n(sd[f"{p}embeddings.word_embeddings.weight"])
        },
        "position_embeddings": {
            "embedding": _n(sd[f"{p}embeddings.position_embeddings.weight"])
        },
        "emb_layer_norm": {
            "LayerNorm_0": {
                "scale": _n(sd[f"{p}embeddings.LayerNorm.weight"]),
                "bias": _n(sd[f"{p}embeddings.LayerNorm.bias"]),
            }
        },
    }
    for i in range(n_layers):
        lp = f"{p}transformer.layer.{i}."
        out[f"layer_{i}"] = {
            "attention": {
                name: {
                    "kernel": _t(sd[f"{lp}attention.{name}.weight"]),
                    "bias": _n(sd[f"{lp}attention.{name}.bias"]),
                }
                for name in ("q_lin", "k_lin", "v_lin", "out_lin")
            },
            "sa_layer_norm": {
                "LayerNorm_0": {
                    "scale": _n(sd[f"{lp}sa_layer_norm.weight"]),
                    "bias": _n(sd[f"{lp}sa_layer_norm.bias"]),
                }
            },
            "ffn_lin1": {
                "kernel": _t(sd[f"{lp}ffn.lin1.weight"]),
                "bias": _n(sd[f"{lp}ffn.lin1.bias"]),
            },
            "ffn_lin2": {
                "kernel": _t(sd[f"{lp}ffn.lin2.weight"]),
                "bias": _n(sd[f"{lp}ffn.lin2.bias"]),
            },
            "output_layer_norm": {
                "LayerNorm_0": {
                    "scale": _n(sd[f"{lp}output_layer_norm.weight"]),
                    "bias": _n(sd[f"{lp}output_layer_norm.bias"]),
                }
            },
        }
    return out


def _ln(sd: Dict, key: str) -> Dict:
    return {
        "LayerNorm_0": {
            "scale": _n(sd[f"{key}.weight"]),
            "bias": _n(sd[f"{key}.bias"]),
        }
    }


def _dense(sd: Dict, key: str, bias: bool = True) -> Dict:
    out = {"kernel": _t(sd[f"{key}.weight"])}
    if bias:
        out["bias"] = _n(sd[f"{key}.bias"])
    return out


def _var_attention(sd: Dict, key: str) -> Dict:
    return {"qkv": _dense(sd, f"{key}.qkv"), "proj": _dense(sd, f"{key}.proj")}


def _convert_object_tower(
    sd: Dict,
    prefix: str,
    depth: int,
    num_frames: int,
    temporal_fix: str = "zeros",
    has_time_module: bool = False,
) -> Dict:
    p = prefix
    out = {
        "cls_token": _n(sd[f"{p}cls_token"]),
        "custom_pos_embed": _n(sd[f"{p}custom_pos_embed"]),
        "temporal_embed": inflate_temporal_embed(
            _n(sd[f"{p}temporal_embed"]), num_frames, temporal_fix
        ),
        "object_embedding": _dense(sd, f"{p}object_embedding"),
        "pos_embedding": _dense(sd, f"{p}pos_embedding"),
        "proj": {"kernel": _t(sd[f"{p}proj.weight"])},
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}."
        blk = {
            "norm1": _ln(sd, f"{bp}norm1"),
            "norm2": _ln(sd, f"{bp}norm2"),
            "attn": _var_attention(sd, f"{bp}attn"),
            "mlp": {
                "fc1": _dense(sd, f"{bp}mlp.fc1"),
                "fc2": _dense(sd, f"{bp}mlp.fc2"),
            },
        }
        if has_time_module and f"{bp}timeattn.qkv.weight" in sd:
            blk["norm3"] = _ln(sd, f"{bp}norm3")
            blk["timeattn"] = _var_attention(sd, f"{bp}timeattn")
        out[f"blocks_{i}"] = blk
    # the reference's unused final `norm` LayerNorm is intentionally skipped
    return out


def _wn_dense(sd: Dict, key: str) -> Dict:
    out = {
        "g": _n(sd[f"{key}.weight_g"]).reshape(()),
        "v": _t(sd[f"{key}.weight_v"]),
    }
    if f"{key}.bias" in sd:
        out["bias"] = _n(sd[f"{key}.bias"])
    return out


def _fcnet(sd: Dict, key: str, n_layers: int = 1) -> Dict:
    # reference FCNet Sequential: weight-normed Linear at even indices
    return {
        f"layer{i}": _wn_dense(sd, f"{key}.main.{2 * i}") for i in range(n_layers)
    }


def _convert_qa_head(sd: Dict, prefix: str) -> Dict:
    p = prefix
    return {
        "v_att": {
            "v_proj": _fcnet(sd, f"{p}v_att.v_proj"),
            "q_proj": _fcnet(sd, f"{p}v_att.q_proj"),
            "linear": _wn_dense(sd, f"{p}v_att.linear"),
        },
        "classifier": {
            "q_net": _fcnet(sd, f"{p}classifier.q_net"),
            "v_net": _fcnet(sd, f"{p}classifier.v_net"),
            "main1": _dense(sd, f"{p}classifier.main.0"),
            "main2": _dense(sd, f"{p}classifier.main.3"),
        },
    }


class _TrackingDict(dict):
    """dict recording which state-dict keys the conversion consumed."""

    def __init__(self, d):
        super().__init__(d)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        hit = super().__contains__(k)
        if hit:
            self.consumed.add(k)
        return hit


def _expected_unused(key: str, has_time_module: bool) -> bool:
    """Keys a reference ObjectRelation state dict carries but whose params
    the reference model itself never applies:
      * object_model.norm.* — the final LayerNorm is created but never called
        (object_transformer.py:381,437-452)
      * blocks.N.norm3.* — only applied on the 'timeattn' path
        (object_transformer.py:245-261); dead weights otherwise
      * HF position_ids — a non-parameter buffer in older transformers
    """
    import re

    if re.fullmatch(r"object_model\.norm\.(weight|bias)", key):
        return True
    if not has_time_module and re.fullmatch(
        r"object_model\.blocks\.\d+\.norm3\.(weight|bias)", key
    ):
        return True
    if key == "text_model.embeddings.position_ids":
        return True
    return False


# --------------------------------------------------------------------------
def convert_reference_checkpoint(
    state_dict: Dict[str, np.ndarray],
    num_frames: int,
    depth: int = 12,
    n_text_layers: int = 6,
    temporal_fix: str = "zeros",
    has_qa_head: Optional[bool] = None,
    has_time_module: Optional[bool] = None,
    strict: bool = False,
) -> Dict:
    """Reference model state_dict (numpy values) -> flax params
    {'params': {...}} for ObjectRelation / ObjectQARelation / ObjectMCRelation.

    strict=True asserts the conversion is TOTAL over the checkpoint: every
    state-dict key is either consumed by the mapping or provably dead in the
    reference model itself (see _expected_unused); anything else raises —
    the guard against a released checkpoint carrying weights we'd silently
    drop."""
    sd = strip_dp_prefix(state_dict)
    if has_qa_head is None:
        has_qa_head = any(k.startswith("head.") for k in sd)
    if has_time_module is None:
        has_time_module = any(".timeattn." in k for k in sd)
    if strict:
        sd = _TrackingDict(sd)

    params = {
        "text_tower": {
            "text_model": _convert_distilbert(sd, "text_model.", n_text_layers),
            "txt_proj": _dense(sd, "txt_proj.1"),
        },
        "object_model": _convert_object_tower(
            sd, "object_model.", depth, num_frames, temporal_fix, has_time_module
        ),
    }
    if has_qa_head:
        params["head"] = _convert_qa_head(sd, "head.")
    if strict:
        leftover = [
            k
            for k in set(sd) - sd.consumed
            if not _expected_unused(k, has_time_module)
        ]
        if leftover:
            raise ValueError(
                "checkpoint keys not consumed by the conversion: "
                + ", ".join(sorted(leftover))
            )
    return {"params": params}


def load_reference_checkpoint(
    path: str,
    num_frames: int,
    **kwargs,
) -> Dict:
    """Load a reference .pth checkpoint with torch (CPU) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return convert_reference_checkpoint(sd, num_frames=num_frames, **kwargs)


def import_timm_vit(
    vit_state_dict: Dict[str, np.ndarray],
    params: Dict,
    depth: int = 12,
) -> Dict:
    """Initialize the region tower from a timm ViT-B/16 checkpoint, matching
    the reference's non-strict load (object_transformer.py:470-483): only
    cls_token and blocks.* transfer; embeddings/proj stay at init."""
    sd = {k: np.asarray(v) for k, v in vit_state_dict.items()}
    import copy

    params = copy.deepcopy(params)
    tower = params["params"]["object_model"]
    if "cls_token" in sd:
        tower["cls_token"] = _n(sd["cls_token"])
    for i in range(depth):
        bp = f"blocks.{i}."
        if f"{bp}attn.qkv.weight" not in sd:
            continue
        blk = tower[f"blocks_{i}"]
        blk["norm1"] = _ln(sd, f"{bp}norm1")
        blk["norm2"] = _ln(sd, f"{bp}norm2")
        blk["attn"] = _var_attention(sd, f"{bp}attn")
        blk["mlp"] = {
            "fc1": _dense(sd, f"{bp}mlp.fc1"),
            "fc2": _dense(sd, f"{bp}mlp.fc2"),
        }
    return params
