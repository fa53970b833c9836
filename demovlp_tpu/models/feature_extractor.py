"""Online region-feature extraction (the BASELINE.json stretch item).

The reference consumes offline bottom-up-attention features: an external
C++/CUDA Caffe project (reference README.md:69) produces per-frame npz files
{x: (N, 2048), bbox: (N, 4), objects_conf, image_w/h} that every dataset
reads from disk; the detector itself is a preprocessing black box outside
the repo. This module is the TPU-native replacement: a JAX/Flax ViT encodes
raw frames, a learned-query saliency head scores patches, and the top-K
patches become "regions" — emitted in EXACTLY the offline pipeline's
contract ((B, F, K, 2048+6) appearance+geometry, validity mask, per-frame
counts; see data/regions.py), so the entire downstream framework (datasets
excepted, models/losses/trainers unchanged) runs from pixels with no
external detector.

Design notes (TPU-first):
  * patches ARE the proposals: a P x P grid gives static shapes (no
    dynamic-box detector inside jit); top-K over saliency is a
    jax.lax.top_k — MXU-friendly, no data-dependent shapes.
  * geometry is the patch box in the reference's 6-d normalized layout
    (x1/W, y1/H, x2/W, y2/H, w/W, h/H) — data/regions.py:31-42.
  * confidence = saliency softmax mass; regions come out conf-sorted like
    the offline reader's conf-sort (data/regions.py pipeline step 1).
  * the whole extractor jits and shards over the 'data' mesh axis like any
    tower; gradients flow, so it can be trained end-to-end or frozen.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from demovlp_tpu.models.layers import Mlp, trunc_normal_init

APPEARANCE_DIM = 2048
GEOMETRY_DIM = 6


class _ViTBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(h, h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = Mlp(hidden_dim=self.dim * 4, out_dim=self.dim, dtype=self.dtype,
                name="mlp")(h, deterministic=deterministic)
        return x + h


class PatchRegionExtractor(nn.Module):
    """Raw frames -> bottom-up-attention-compatible region features.

    Input:  frames (B, F, H, W, 3) float32 in [0, 1]
    Output: dict(object (B, F, K, 2054), object_mask (B, F, K),
                 conf (B, F, K)) — the data/regions.py contract, ready for
    ObjectRelation / the QA/MC models.
    """

    object_num: int = 30
    patch: int = 16
    embed_dim: int = 384
    depth: int = 6
    heads: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames, deterministic: bool = True):
        b, f, h, w, c = frames.shape
        assert h % self.patch == 0 and w % self.patch == 0, (h, w, self.patch)
        gh, gw = h // self.patch, w // self.patch
        n = gh * gw
        k = self.object_num
        assert k <= n, (k, n)

        x = frames.reshape(b * f, h, w, c).astype(self.dtype)
        # patchify = non-overlapping conv, the standard ViT stem
        x = nn.Conv(
            self.embed_dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), dtype=self.dtype, name="stem",
        )(x)
        x = x.reshape(b * f, n, self.embed_dim)
        pos = self.param(
            "pos_embed", trunc_normal_init(0.02), (1, n, self.embed_dim)
        )
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            x = _ViTBlock(
                self.embed_dim, self.heads, self.dtype, name=f"block_{i}"
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)

        # saliency: a learned query scores every patch (detector-confidence
        # analog); softmax mass = conf
        q = self.param("saliency_query", trunc_normal_init(0.02),
                       (self.embed_dim,))
        logits = jnp.einsum("npd,d->np", x, q.astype(x.dtype))
        conf_all = jax.nn.softmax(
            logits.astype(jnp.float32) * (self.embed_dim ** -0.5), axis=-1
        )
        conf, idx = jax.lax.top_k(conf_all, k)  # sorted desc = conf-sort

        sel = jnp.take_along_axis(x, idx[..., None], axis=1)  # (bf, k, d)
        appearance = nn.Dense(
            APPEARANCE_DIM, dtype=self.dtype, name="appearance_proj"
        )(sel.astype(self.dtype)).astype(jnp.float32)

        # patch boxes in the reference's normalized 6-d geometry layout
        gy = (idx // gw).astype(jnp.float32)
        gx = (idx % gw).astype(jnp.float32)
        x1, y1 = gx / gw, gy / gh
        x2, y2 = (gx + 1.0) / gw, (gy + 1.0) / gh
        wid = jnp.full_like(x1, 1.0 / gw)
        hei = jnp.full_like(y1, 1.0 / gh)
        geometry = jnp.stack([x1, y1, x2, y2, wid, hei], axis=-1)

        obj = jnp.concatenate([appearance, geometry], axis=-1)
        return {
            "object": obj.reshape(b, f, k, APPEARANCE_DIM + GEOMETRY_DIM),
            "object_mask": jnp.ones((b, f, k), jnp.float32),
            "conf": conf.reshape(b, f, k),
        }
