"""Bottom-Up-Top-Down VQA head (reference model/video_qa_mdoel.py).

Semantics preserved exactly:
  * question-guided region attention uses weight-normed projections, a
    MULTIPLICATIVE mask on the pre-softmax logits (logits * mask, NOT an
    additive -inf mask — video_qa_mdoel.py:74), then softmax over regions
  * classifier: elementwise product of projected question and attended
    region vector -> 2-layer MLP
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from demovlp_tpu.models.layers import FCNet, WeightNormDense


class QAAttention(nn.Module):
    v_dim: int
    q_dim: int
    hid_dim: int
    glimpses: int = 1
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v, v_mask, q, deterministic: bool = True):
        """v (B, K, v_dim); v_mask (B, K) binary; q (B, q_dim)."""
        v_proj = FCNet([self.v_dim, self.hid_dim], dtype=self.dtype, name="v_proj")(v)
        q_proj = FCNet([self.q_dim, self.hid_dim], dtype=self.dtype, name="q_proj")(q)[
            :, None, :
        ]
        joint = nn.Dropout(self.dropout)(v_proj * q_proj, deterministic=deterministic)
        logits = WeightNormDense(self.glimpses, dtype=self.dtype, name="linear")(joint)
        logits = logits * v_mask[..., None].astype(logits.dtype)
        return nn.softmax(logits, axis=1), logits


class SimpleClassifier(nn.Module):
    q_dim: int
    v_dim: int
    hid_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_emb, v_emb, deterministic: bool = True):
        q = FCNet([self.q_dim, self.hid_dim], dtype=self.dtype, name="q_net")(q_emb)
        v = FCNet([self.v_dim, self.hid_dim], dtype=self.dtype, name="v_net")(v_emb)
        joint = q * v
        x = nn.Dense(self.hid_dim * 2, dtype=self.dtype, name="main1")(joint)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="main2")(x)


class BUTDQAHead(nn.Module):
    v_dim: int
    q_dim: int
    hid_dim: int
    out_dim: int
    dropout: float = 0.2  # reference Attention dropout (video_qa_mdoel.py:63)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, txt_embed, obj_embed, obj_mask, deterministic: bool = True):
        """txt_embed (B, q_dim); obj_embed (B, K, v_dim); obj_mask (B, K) binary.
        Returns logits (B, out_dim)."""
        att, _ = QAAttention(
            self.v_dim, self.q_dim, self.hid_dim, dropout=self.dropout,
            dtype=self.dtype, name="v_att"
        )(obj_embed, obj_mask, txt_embed, deterministic)
        pooled = jnp.sum(att * obj_embed, axis=1)
        return SimpleClassifier(
            self.q_dim,
            self.v_dim,
            self.hid_dim,
            self.out_dim,
            dtype=self.dtype,
            name="classifier",
        )(txt_embed, pooled, deterministic)
