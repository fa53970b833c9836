"""Region (object) tower: a ViT-B-shaped encoder over detector region features
with divided space-time attention.

Behavior spec (reference model/object_transformer.py):
  * input (B, F, K, 2054): 2048-d appearance + 6-d normalized bbox geometry,
    embedded by two Linears and summed (:400-408)
  * CLS token prepended; additive mask (m-1)*100 (:413-421)
  * positions: custom_pos_embed[0] on CLS only + per-frame temporal embeds
    repeated across the K regions of each frame (:423-432). The spatial rows
    custom_pos_embed[1:] exist in the checkpoint but are never added — kept
    that way for parity.
  * 12 SpaceTimeBlocks: optional time attention (same-region tokens across
    frames) then space attention (regions within a frame), with CLS attending
    globally and CLS keys/values visible to every group (:125-274)
  * residual quirk preserved: the space branch adds to the ORIGINAL x, not to
    the time residual ("frozen-in-time" style, :266-267)
  * the final self.norm LayerNorm is defined but never applied by
    forward_features (:437-447) — we do not create it
  * output projected to 256-d with a bias-free Linear; returns (proj, mask)

TPU-native design notes: the einops-rearrange gymnastics of the reference
become static reshapes/transposes on (B, heads, groups, len, head_dim)
blocks; every attention is a batched MXU matmul with additive-bias masking,
fused by XLA. Sequence lengths are tiny (<=241), so the win is batching, not
flash-attention. (A Pallas grouped-attention prototype lives in
ops/pallas_attention.py as a measurement/test artifact only — it measured
no win over XLA at these shapes and its compiled Mosaic lowering fails at
the flagship f=1/k=30 shape, so it is not a model option.)
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from demovlp_tpu.models.layers import LayerNormFp32, Mlp, trunc_normal_init
from demovlp_tpu.ops.masking import additive_mask


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _block_bias(mode: str, F: int, K: int) -> np.ndarray:
    """Static (1+F*K, 1+F*K) additive bias encoding divided space/time
    attention as masked FULL attention.

    Token i>0 belongs to group (i-1)//K (space: its frame) or (i-1)%K (time:
    its region index). allowed(q, k) = q is CLS, or k is CLS, or same group —
    exactly the key set each row sees in the grouped computation (reference
    object_transformer.py:125-196: CLS attends globally, group members see
    [CLS] + their group). Disallowed pairs get -1e9: after the f32 softmax
    max-shift, exp(-1e9 - m) underflows to exactly 0.0, so the probability
    rows equal the grouped softmax up to reduction-order ulps (padding mask
    adds on top, same as the grouped path). This trades O(N^2/G) attention
    FLOPs for O(N^2) — a win at the reference's tiny group sizes (<=31
    tokens/group, N<=241), where the grouped form's split/concat/broadcast
    layout ops dominate its MXU time.
    """
    n = F * K
    g = np.arange(n) // K if mode == "space" else np.arange(n) % K
    allowed = np.zeros((1 + n, 1 + n), bool)
    allowed[0, :] = True
    allowed[:, 0] = True
    allowed[1:, 1:] = g[:, None] == g[None, :]
    return np.where(allowed, 0.0, -1e9).astype(np.float32)


def _grouped_attention(q, k, v, bias):
    """softmax(q k^T + bias) v, head-LAST layout.

    q: (..., Lq, h, hd), k/v: (..., Lk, h, hd), bias broadcastable to
    (..., h, Lq, Lk). The head axis rides as an einsum batch dim so the
    head split/merge around the attention are free reshapes (no
    (.., L, h, hd) <-> (.., h, L, hd) transposes materialize). Computed in
    fp32 for softmax stability, cast back to q.dtype. Identical
    contractions/reduction order as the head-major form (oracle-pinned).
    """
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


class VarAttention(nn.Module):
    """Divided space/time attention with a globally-attending CLS token
    (reference object_transformer.py:125-196)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    zero_init: bool = False  # reference 'zeros' initialize mode (:142-148)
    # "dense" (default): masked full attention — same math as the grouped
    # form (see _block_bias), one big MXU matmul; measured +21% step
    # throughput at the f=8 fine-tune envelope on v5e (460 vs 379 pairs/s,
    # BENCH_NOTES round 3). "xla": grouped batched matmuls (identical
    # outputs; at single-group shapes both take the same fast path).
    attn_impl: str = "dense"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, add_mask, mode: str, frames: int, patches: int):
        assert mode in ("space", "time")
        if self.attn_impl not in ("xla", "dense"):
            # unknown values must not silently run the default path (a
            # config typo like "desne" would otherwise benchmark xla);
            # 'pallas' was retired: no hardware config could ever run it
            raise ValueError(
                f"unknown attn_impl {self.attn_impl!r}; "
                "expected 'xla' or 'dense'"
            )
        B, N1, D = x.shape
        F, K = frames, patches
        assert N1 == 1 + F * K, (N1, F, K)
        h = self.num_heads
        hd = D // h

        if self.zero_init:
            qkv_kernel_init = nn.initializers.zeros
            proj_kernel_init = nn.initializers.ones  # reference :147
        else:
            qkv_kernel_init = nn.initializers.lecun_normal()
            proj_kernel_init = nn.initializers.lecun_normal()

        qkv = nn.Dense(
            3 * D,
            use_bias=self.qkv_bias,
            kernel_init=qkv_kernel_init,
            dtype=self.dtype,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # head-LAST layout (B, N1, h, hd) — see _grouped_attention
        def to_heads(t):
            return t.reshape(B, N1, h, hd)

        q, k, v = map(to_heads, (q, k, v))
        q = q * (hd ** -0.5)

        mask = add_mask.astype(jnp.float32)  # (B, N1) additive

        # --- single-group fast path (the flagship pre-train shape) ---
        # With one group (space mode at F=1, or time mode at K=1) the grouped
        # computation degenerates to plain full self-attention over the
        # sequence: every group row sees keys [CLS] + all members in sequence
        # order with the same additive mask, and the CLS row is the same
        # full-sequence attention — identical logits/softmax, so identical
        # outputs. Skipping the split/concat/broadcast machinery removes
        # ~7 ms/step of head-tensor layout copies at b=128/f=1/k=30
        # (xplane round 3).
        single_group = (mode == "space" and F == 1) or (
            mode == "time" and K == 1
        )
        if single_group:
            out = _grouped_attention(
                q, k, v, mask[:, None, None, :]
            )  # (B,N1,h,hd)
            return nn.Dense(
                D, kernel_init=proj_kernel_init, dtype=self.dtype, name="proj"
            )(out.reshape(B, N1, D))

        # --- dense path: masked full attention over all N1 tokens ---
        # Same math as the grouped path (see _block_bias); one big batched
        # MXU matmul instead of G tiny ones plus the CLS split/concat layout
        # machinery. The extra FLOPs are cheap at N1<=241.
        if self.attn_impl == "dense":
            bias = mask[:, None, None, :] + jnp.asarray(
                _block_bias(mode, F, K)
            )
            out = _grouped_attention(q, k, v, bias)  # (B,N1,h,hd)
            return nn.Dense(
                D, kernel_init=proj_kernel_init, dtype=self.dtype, name="proj"
            )(out.reshape(B, N1, D))

        # --- CLS attends over the full sequence ---
        cls_out = _grouped_attention(
            q[:, :1], k, v, mask[:, None, None, :]
        )  # (B,1,h,hd)

        # --- grouped attention for the non-CLS tokens ---
        q_, k_, v_ = q[:, 1:], k[:, 1:], v[:, 1:]
        m_ = mask[:, 1:].reshape(B, F, K)

        if mode == "space":
            # groups = frames, members = the K regions of the frame
            G, L = F, K
            def grp(t):
                return t.reshape(B, F, K, h, hd)
            m_g = m_
        else:
            # groups = region index, members = that region across F frames
            G, L = K, F
            def grp(t):
                return t.reshape(B, F, K, h, hd).transpose(0, 2, 1, 3, 4)
            m_g = m_.transpose(0, 2, 1)

        qg, kg, vg = map(grp, (q_, k_, v_))  # (B,G,L,h,hd)

        # CLS keys/values are visible to every group (reference :173-180)
        cls_k = jnp.broadcast_to(k[:, :1][:, None], (B, G, 1, h, hd))
        cls_v = jnp.broadcast_to(v[:, :1][:, None], (B, G, 1, h, hd))
        cls_m = jnp.broadcast_to(mask[:, :1][:, :, None], (B, G, 1))

        kg = jnp.concatenate([cls_k, kg], axis=2)  # (B,G,1+L,h,hd)
        vg = jnp.concatenate([cls_v, vg], axis=2)
        mg = jnp.concatenate([cls_m, m_g], axis=2)  # (B,G,1+L)

        out = _grouped_attention(
            qg, kg, vg, mg[:, :, None, None, :]
        )  # (B,G,L,h,hd)

        if mode == "time":
            out = out.transpose(0, 2, 1, 3, 4)  # (B,F,K,h,hd)
        out = out.reshape(B, F * K, h, hd)
        out = jnp.concatenate([cls_out, out], axis=1)  # (B,N1,h,hd)
        out = out.reshape(B, N1, D)

        return nn.Dense(
            D, kernel_init=proj_kernel_init, dtype=self.dtype, name="proj"
        )(out)


class SpaceTimeBlock(nn.Module):
    """Pre-norm block: [optional time attention] -> space attention -> MLP
    (reference object_transformer.py:199-274)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    time_module: Optional[str] = None
    time_init: str = "rand"
    dropout_rate: float = 0.0
    attn_impl: str = "dense"
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, add_mask, frames: int, patches: int, deterministic: bool = True):
        if self.time_module == "timeattn":
            t = VarAttention(
                self.dim,
                self.num_heads,
                self.qkv_bias,
                zero_init=(self.time_init == "zeros"),
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name="timeattn",
            )(LayerNormFp32(dtype=self.norm_dtype, name="norm3")(x), add_mask, "time", frames, patches)
            time_residual = x + t
        else:
            time_residual = x
        s = VarAttention(
            self.dim, self.num_heads, self.qkv_bias,
            attn_impl=self.attn_impl, dtype=self.dtype, name="attn",
        )(LayerNormFp32(dtype=self.norm_dtype, name="norm1")(time_residual), add_mask, "space", frames, patches)
        # residual from the ORIGINAL x (frozen-in-time), reference :266-267
        space_residual = x + s
        m = Mlp(
            int(self.dim * self.mlp_ratio),
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="mlp",
        )(LayerNormFp32(dtype=self.norm_dtype, name="norm2")(space_residual), deterministic=deterministic)
        return space_residual + m


class ObjectTransformer(nn.Module):
    """Region tower (reference object_transformer.py:296-452)."""

    input_dim: int = 2054
    region_nums: int = 20  # K (used only for the pos-embed param shape)
    num_frames: int = 4  # max frames (temporal embed param shape)
    output_dim: int = 256
    time_module: Optional[str] = None
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    time_init: str = "rand"
    appearance_dim: int = 2048
    dropout_rate: float = 0.0
    attn_impl: str = "dense"
    dtype: Any = jnp.float32
    # LayerNorm compute dtype: f32 = reference numerics; bf16 drops the
    # up/down converts around every norm (see layers.LayerNormFp32)
    norm_dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint each block (memory/flops trade)

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        """x: (B, F, K, input_dim) region features; x_mask: (B, F, K) binary.

        Returns (embeddings (B, 1+F*K, output_dim), additive_mask (B, 1+F*K)).
        """
        B, F, K, C = x.shape
        D = self.embed_dim
        x = x.astype(self.dtype)

        appearance = x[..., : self.appearance_dim]
        geometry = x[..., self.appearance_dim:]
        tokens = nn.Dense(D, dtype=self.dtype, name="object_embedding")(appearance)
        tokens = tokens + nn.Dense(D, dtype=self.dtype, name="pos_embedding")(geometry)
        tokens = tokens.reshape(B, F * K, D)

        cls_token = self.param(
            "cls_token", trunc_normal_init(0.02), (1, 1, D), jnp.float32
        )
        # (K+1, D): row 0 is the CLS position embed; rows 1: are never added
        # (reference :423-432) but kept in the checkpoint layout
        custom_pos_embed = self.param(
            "custom_pos_embed",
            trunc_normal_init(0.02),
            (1, self.region_nums + 1, D),
            jnp.float32,
        )
        temporal_embed = self.param(
            "temporal_embed", nn.initializers.zeros, (1, self.num_frames, D), jnp.float32
        )

        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, D))
        h = jnp.concatenate([cls, tokens], axis=1)  # (B, 1+F*K, D)

        mask = jnp.concatenate(
            [jnp.ones((B, 1), x_mask.dtype), x_mask.reshape(B, F * K)], axis=1
        )
        add_mask = additive_mask(mask)  # (B, 1+F*K), 0 / -100

        # temporal embed tiled within each frame: [t0]*K ++ [t1]*K ++ ...
        tile_temporal = jnp.repeat(
            temporal_embed[:, :F, :], K, axis=1
        )  # (1, F*K, D)
        pos = jnp.concatenate(
            [custom_pos_embed[:, :1, :], tile_temporal], axis=1
        )  # (1, 1+F*K, D)
        h = h + pos.astype(self.dtype)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)

        block_cls = SpaceTimeBlock
        if self.remat:
            block_cls = nn.remat(SpaceTimeBlock, static_argnums=(2, 3, 4))
        for i in range(self.depth):
            h = block_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.qkv_bias,
                time_module=self.time_module,
                time_init=self.time_init,
                dropout_rate=self.dropout_rate,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                norm_dtype=self.norm_dtype,
                name=f"blocks_{i}",
            )(h, add_mask, F, K, deterministic)

        out = nn.Dense(
            self.output_dim, use_bias=False, dtype=self.dtype, name="proj"
        )(h)
        return out, add_mask
