"""Pallas TPU kernel: fused cross-modal (RWA) attention similarity.

Fuses the whole func_attention -> cosine -> mean pipeline of
reference model/loss.py:209-330 into one VMEM-resident kernel per
(context-block x query-block) grid tile, so the (Bc, Bq, Lq, Ls) attention
tensor is never materialized in HBM. For a B=128 pre-train batch that tensor
is ~194 MB fp32 per direction — the kernel reduces HBM traffic to the
embedding blocks plus a (Bc, Bq) output tile.

Layout strategy: all matmuls are 2-D (block_c*Ls, D) x (D, block_q*Lq)
MXU ops; the softmax/renorm run on a (block_c*block_q*Lq, Ls) view so the
reduction axis is minor. Callers pad Lq and Ls to lane multiples; padding is
exact (not approximate) because
  * zero query vectors contribute zero to the leaky-relu'd l2norm over Lq
    and produce cos = 0 terms, so sums over Lq are unchanged and the mean
    divides by the REAL Lq;
  * padded context positions carry a -100 additive mask (suppressed by the
    lambda=20 softmax to ~1e-800) and the focal threshold uses the REAL Ls.
A re-attention denominator guard (max(sum, 1e-30)) protects the exactly-
uniform rows padding creates; real rows are untouched.

Gradients: jax.custom_vjp with the Pallas kernel forward and an XLA
recompute backward (the op is cheap enough to recompute; the win is fused
forward + no giant residuals).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis(x, axis: int, target: int, value=0.0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _fa_sim_kernel(
    ctx_ref, qry_ref, cmask_ref, out_ref, *, lam, focal_equal, ls_real, lq_real
):
    """One (BC, BQ) tile of sim[c, q] = mean_l cos(q_l, wctx_{c,q,l})."""
    bc, ls, d = ctx_ref.shape
    bq, lq, _ = qry_ref.shape

    c = ctx_ref[...]
    q = qry_ref[...]
    eps = 1e-8
    cn = c / (jnp.sqrt(jnp.sum(c * c, -1, keepdims=True)) + eps)
    qn = q / (jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)) + eps)

    # raw attention: (bc*ls, bq*lq)
    a = jnp.dot(
        cn.reshape(bc * ls, d),
        qn.reshape(bq * lq, d).T,
        preferred_element_type=jnp.float32,
    )
    a = jnp.where(a >= 0, a, 0.1 * a)
    # l2norm over lq: view (bc*ls*bq, lq)
    a = a.reshape(bc * ls * bq, lq)
    a = a / (jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)) + eps)
    # -> (bc, bq, lq, ls) with ls minor for the softmax
    a = a.reshape(bc, ls, bq, lq).transpose(0, 2, 3, 1)
    a = a + cmask_ref[...][:, None, None, :]
    a = a.reshape(bc * bq * lq, ls)
    p = jax.nn.softmax(a * lam, axis=-1)
    if focal_equal:
        h = ((p * ls_real - jnp.sum(p, -1, keepdims=True)) > 0).astype(p.dtype)
        p = h * p
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1e-30)
    # weighted context: (bc, bq*lq, d) via per-c matmul (bq*lq, ls)x(ls, d)
    p = p.reshape(bc, bq * lq, ls)
    w = jax.lax.dot_general(
        p, cn,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bc, bq*lq, d)
    # cosine with the raw query, zero for zero-padded queries
    qf = q.reshape(bq * lq, d)
    num = jnp.sum(w * qf[None], -1)  # (bc, bq*lq)
    den = jnp.sqrt(jnp.sum(w * w, -1)) * jnp.sqrt(
        jnp.sum(qf * qf, -1)
    )[None]
    cos = num / jnp.maximum(den, eps)
    # mean over REAL lq
    sim = jnp.sum(cos.reshape(bc, bq, lq), axis=-1) / lq_real
    out_ref[...] = sim


def _fa_sim_pallas(
    context, query, ctx_mask, lam: float, focal_equal: bool,
    ls_real: int, lq_real: int, block_c: int, block_q: int,
    interpret: bool = False,
):
    """sim (Bc, Bq) with padded inputs; Bc % block_c == 0, Bq % block_q == 0."""
    bc_total, ls, d = context.shape
    bq_total, lq, _ = query.shape
    grid = (bc_total // block_c, bq_total // block_q)

    kernel = functools.partial(
        _fa_sim_kernel,
        lam=lam,
        focal_equal=focal_equal,
        ls_real=ls_real,
        lq_real=lq_real,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_c, ls, d), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_q, lq, d), lambda i, j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_c, ls), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_c, block_q), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bc_total, bq_total), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bc_total * bq_total * ls * lq * d * 2,
            bytes_accessed=(bc_total * ls + bq_total * lq) * d * 4
            + bc_total * bq_total * 4,
            transcendentals=bc_total * bq_total * lq * ls,
        ),
    )(context, query, ctx_mask)


def _choose_blocks(ls: int, lq: int, n_c: int, n_q: int) -> Tuple[int, int]:
    """Pick tile sizes keeping the (bc*ls, bq*lq) fp32 buffer ~<= 2.5 MB."""
    budget = 2_500_000 // 4
    for bc, bq in ((8, 8), (8, 4), (4, 4), (4, 2), (2, 2), (1, 1)):
        if bc * ls * bq * lq <= budget and n_c % bc == 0 and n_q % bq == 0:
            return bc, bq
    return 1, 1


def _direction_sim(
    context, query, ctx_mask, lam, focal_equal, interpret=False
):
    """Padded + blocked wrapper around the kernel: sim (n_ctx, n_query)."""
    n_c, ls_real, d = context.shape
    n_q, lq_real, _ = query.shape
    ls = _round_up(max(ls_real, 8), 128)
    lq = _round_up(max(lq_real, 8), 128)
    # batch axes to a block multiple
    block_c, block_q = _choose_blocks(ls, lq, _round_up(n_c, 8), _round_up(n_q, 8))
    n_c_pad = _round_up(n_c, block_c)
    n_q_pad = _round_up(n_q, block_q)

    ctx = _pad_axis(_pad_axis(context.astype(jnp.float32), 1, ls), 0, n_c_pad)
    qry = _pad_axis(_pad_axis(query.astype(jnp.float32), 1, lq), 0, n_q_pad)
    cm = _pad_axis(
        _pad_axis(ctx_mask.astype(jnp.float32), 1, ls, value=-100.0), 0, n_c_pad
    )
    sim = _fa_sim_pallas(
        ctx, qry, cm, lam, focal_equal, ls_real, lq_real,
        block_c, block_q, interpret=interpret,
    )
    return sim[:n_c, :n_q]


def _xattn_score_pallas_fwd_impl(
    images, captions, img_mask, cap_mask, lam, focal_equal, interpret=False
):
    i2t = _direction_sim(images, captions, img_mask, lam, focal_equal, interpret)
    t2i = _direction_sim(captions, images, cap_mask, lam, focal_equal, interpret)
    return t2i.T + i2t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _xattn_score_pallas(images, captions, img_mask, cap_mask, lam, focal_equal):
    return _xattn_score_pallas_fwd_impl(
        images, captions, img_mask, cap_mask, lam, focal_equal
    )


def _fwd(images, captions, img_mask, cap_mask, lam, focal_equal):
    out = _xattn_score_pallas(images, captions, img_mask, cap_mask, lam, focal_equal)
    return out, (images, captions, img_mask, cap_mask)


def _bwd(lam, focal_equal, residuals, g):
    from demovlp_tpu.ops.xattn import _xattn_score_xla

    images, captions, img_mask, cap_mask = residuals
    focal_type = "equal" if focal_equal else "prob"
    _, vjp = jax.vjp(
        lambda im, ca: _xattn_score_xla(im, ca, img_mask, cap_mask, lam, focal_type),
        images,
        captions,
    )
    d_im, d_ca = vjp(g)
    return d_im, d_ca, None, None


_xattn_score_pallas.defvjp(_fwd, _bwd)


def xattn_score_pallas(
    images, captions, img_mask, cap_mask,
    lambda_softmax: float = 20.0, focal_type: str = "prob",
):
    """Drop-in replacement for ops.xattn._xattn_score_xla (same semantics,
    fused Pallas forward, XLA-recompute backward)."""
    return _xattn_score_pallas(
        images, captions, img_mask, cap_mask,
        float(lambda_softmax), focal_type == "equal",
    )


def xattn_score_pallas_interpret(
    images, captions, img_mask, cap_mask,
    lambda_softmax: float = 20.0, focal_type: str = "prob",
):
    """Interpreter-mode variant for CPU tests."""
    return _xattn_score_pallas_fwd_impl(
        images, captions, img_mask, cap_mask,
        float(lambda_softmax), focal_type == "equal", interpret=True,
    )
