"""DistilBERT text tower in Flax.

The reference loads HF `distilbert-base-uncased` via AutoModel
(model/model.py:29). Offline-first rebuild: a small, self-contained Flax
implementation of the same architecture (post-LN, 6 layers, 12 heads,
GELU-exact FFN, sinusoid-free learned positions, LayerNorm eps 1e-12) whose
parameter tree maps 1:1 onto the HF checkpoint via
demovlp_tpu/convert/torch_import.py, so pretrained weights load when present
and random init works when not.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    max_position_embeddings: int = 512
    dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12


class _LayerNorm(nn.Module):
    epsilon: float
    dtype: Any = jnp.float32  # compute dtype; params stay f32 (layers.py note)

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon, dtype=self.dtype, param_dtype=jnp.float32,
            # canonicalized so string dtypes behave like jnp dtype objects
            force_float32_reductions=(jnp.dtype(self.dtype) == jnp.float32),
        )(x.astype(self.dtype))
        return y.astype(orig)


class _SelfAttention(nn.Module):
    config: DistilBertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, add_bias, deterministic: bool = True):
        cfg = self.config
        B, L, D = x.shape
        h = cfg.n_heads
        hd = D // h

        def proj(name):
            return nn.Dense(D, dtype=self.dtype, name=name)

        # head-LAST layout (B, L, h, hd): the head split/merge are free
        # reshapes and the head axis rides as an einsum batch dim, so no
        # (B,L,h,hd)<->(B,h,L,hd) transposes ever materialize. Identical
        # contractions/reduction order => bit-identical to the head-major
        # form (pinned by the torch parity tests).
        def to_heads(t):
            return t.reshape(B, L, h, hd)

        q = to_heads(proj("q_lin")(x)) / jnp.sqrt(hd).astype(self.dtype)
        k = to_heads(proj("k_lin")(x))
        v = to_heads(proj("v_lin")(x))

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + add_bias  # (B,1,1,L)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(B, L, D)
        return proj("out_lin")(out)


class _TransformerBlock(nn.Module):
    config: DistilBertConfig
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, add_bias, deterministic: bool = True):
        cfg = self.config
        attn = _SelfAttention(cfg, self.dtype, name="attention")(
            x, add_bias, deterministic
        )
        x = _LayerNorm(cfg.layer_norm_eps, self.norm_dtype, name="sa_layer_norm")(x + attn)
        y = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="ffn_lin1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.dim, dtype=self.dtype, name="ffn_lin2")(y)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        return _LayerNorm(cfg.layer_norm_eps, self.norm_dtype, name="output_layer_norm")(x + y)


class DistilBertModel(nn.Module):
    config: DistilBertConfig = DistilBertConfig()
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        """input_ids (B, L) int32; attention_mask (B, L) 1/0.
        Returns last_hidden_state (B, L, dim)."""
        cfg = self.config
        B, L = input_ids.shape

        # Embedding tables stay f32 through the gather: nn.Embed(dtype=bf16)
        # casts the WHOLE (vocab, dim) table before the take — an explicit
        # 0.57 ms/step bf16[30522,768] fusion in the round-3 xplane trace —
        # to read ~12.8k rows. Gather f32 rows, cast the (B, L, dim) result
        # after the (f32-stat) embedding LayerNorm instead. Also matches the
        # reference's f32 embedding-sum/LayerNorm numerics exactly.
        word_emb = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=jnp.float32, name="word_embeddings"
        )(input_ids)
        positions = jnp.arange(L)[None, :]
        pos_emb = nn.Embed(
            cfg.max_position_embeddings, cfg.dim, dtype=jnp.float32,
            name="position_embeddings",
        )(positions)
        x = _LayerNorm(cfg.layer_norm_eps, self.norm_dtype, name="emb_layer_norm")(word_emb + pos_emb)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        x = x.astype(self.dtype)

        # large-negative additive bias for padded keys (HF uses masked_fill
        # with -inf; a finite large-negative is the numerically-safe TPU form)
        neg = jnp.asarray(-1e9, dtype=jnp.float32)
        add_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

        for i in range(cfg.n_layers):
            x = _TransformerBlock(cfg, self.dtype, self.norm_dtype, name=f"layer_{i}")(
                x, add_bias, deterministic
            )
        return x
