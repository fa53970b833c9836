"""Pallas TPU kernel: fused masked attention core for the divided space-time
attention (softmax(q k^T + bias) v over groups).

The region tower's attention runs on many tiny groups — (B*heads*groups)
batched matmuls with L <= ~32 keys (object_transformer.py grouped branches).
XLA lowers this to batched MXU matmuls + fused softmax already; this kernel
exists to (a) fuse the whole chain into one VMEM pass per group block and
(b) let us measure whether hand fusion beats XLA at these shapes (it's
selectable, default off — see models/object_transformer.py `attn_impl`).

Layout: inputs flattened to (G_total, L_q, hd) / (G_total, L_k, hd) /
bias (G_total, L_k); grid blocks over G_total. hd and L_k are padded to lane
multiples by the caller; padded keys carry -1e9 bias so softmax ignores
them, padded hd lanes are zero so matmuls are exact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    g, lq, hd = q_ref.shape
    _, lk, _ = k_ref.shape
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    bias = bias_ref[:, 0, :]  # (g, lk); carried 3-D for tiling rules
    # batched (g) matmuls on the MXU
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (g, lq, lk)
    logits = logits + bias[:, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (g, lq, hd)
    out_ref[...] = out.astype(out_ref.dtype)


def grouped_attention_pallas(q, k, v, bias, block_g: int = 16, interpret: bool = False):
    """q (G, Lq, hd), k/v (G, Lk, hd), bias additive (G, Lk) -> (G, Lq, hd).

    q must already include any scale factor. Handles padding internally.
    """
    G, lq, hd = q.shape
    _, lk, _ = k.shape
    dtype = q.dtype

    lq_p = _round_up(max(lq, 8), 8)
    lk_p = _round_up(max(lk, 8), 128)
    hd_p = _round_up(max(hd, 8), 128)
    g_p = _round_up(G, block_g)

    def pad(x, g, l, d):
        return jnp.pad(
            x, ((0, g - x.shape[0]), (0, l - x.shape[1]), (0, d - x.shape[2]))
        )

    qp = pad(q, g_p, lq_p, hd_p)
    kp = pad(k, g_p, lk_p, hd_p)
    vp = pad(v, g_p, lk_p, hd_p)
    biasp = jnp.pad(
        bias.astype(jnp.float32),
        ((0, g_p - G), (0, lk_p - lk)),
        constant_values=-1e9,
    )

    grid = (g_p // block_g,)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_g, lq_p, hd_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, lk_p, hd_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, lk_p, hd_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, 1, lk_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_g, lq_p, hd_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_p, lq_p, hd_p), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * g_p * lq_p * lk_p * hd_p,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=g_p * lq_p * lk_p,
        ),
    )(qp, kp, vp, biasp[:, None, :])
    return out[:G, :lq, :hd]


def grouped_attention_xla(q, k, v, bias):
    """Reference XLA path with identical semantics."""
    logits = jnp.einsum("gqd,gkd->gqk", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias[:, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("gqk,gkd->gqd", probs, v)


@jax.custom_vjp
def grouped_attention_fused(q, k, v, bias):
    """Pallas forward, XLA-recompute backward (trainable)."""
    return grouped_attention_pallas(q, k, v, bias)


def _ga_fwd(q, k, v, bias):
    return grouped_attention_fused(q, k, v, bias), (q, k, v, bias)


def _ga_bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(grouped_attention_xla, q, k, v, bias)
    return vjp(g)


grouped_attention_fused.defvjp(_ga_fwd, _ga_bwd)
