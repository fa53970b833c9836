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
    """One (BC, BQ) tile of sim[c, q] = mean_l cos(q_l, wctx_{c,q,l}).

    Transpose-free: the context block is processed one item at a time so the
    working set stays a (bq*lq, ls) matrix whose reductions land on natural
    axes — l2norm over lq is a per-query-group sublane reduction, the
    softmax/focal renorm are lane (minor-axis) reductions, and both matmuls
    are plain 2-D MXU ops."""
    bc, ls, d = ctx_ref.shape
    bq, lq, _ = qry_ref.shape
    eps = 1e-8

    q = qry_ref[...]
    qn = q / (jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)) + eps)
    qn_flat = qn.reshape(bq * lq, d)
    qf = q.reshape(bq * lq, d)
    q_norm = jnp.sqrt(jnp.sum(qf * qf, -1))  # (bq*lq,)

    for ci in range(bc):  # static unroll over the context block
        c = ctx_ref[ci]  # (ls, d)
        cmask = cmask_ref[ci, 0, :]  # (ls,)
        cn = c / (jnp.sqrt(jnp.sum(c * c, -1, keepdims=True)) + eps)

        # raw attention (bq*lq, ls): lanes = source positions
        a = jnp.dot(qn_flat, cn.T, preferred_element_type=jnp.float32)
        a = jnp.where(a >= 0, a, 0.1 * a)
        # l2norm over lq: per (q, s) across the lq rows of each query group
        sq = jnp.sum(a.reshape(bq, lq, ls) ** 2, axis=1, keepdims=True)
        a = (a.reshape(bq, lq, ls) / (jnp.sqrt(sq) + eps)).reshape(bq * lq, ls)
        a = a + cmask[None, :]
        p = jax.nn.softmax(a * lam, axis=-1)
        if focal_equal:
            h = ((p * ls_real - jnp.sum(p, -1, keepdims=True)) > 0).astype(
                p.dtype
            )
            p = h * p
            p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1e-30)
        # weighted context (bq*lq, d) then cosine with the raw query
        w = jnp.dot(p, cn, preferred_element_type=jnp.float32)
        num = jnp.sum(w * qf, -1)
        den = jnp.sqrt(jnp.sum(w * w, -1)) * q_norm
        cos = num / jnp.maximum(den, eps)
        sim = jnp.sum(cos.reshape(bq, lq), axis=-1) / lq_real  # (bq,)
        out_ref[0, 0, ci, :] = sim


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
    # output is a (grid_i, grid_j, block_c, block_q) tile array so the block's
    # trailing dims equal the array's (Mosaic tiling rule); callers reshape
    out = pl.pallas_call(
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
                (block_c, 1, ls), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_c, block_q),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid[0], grid[1], block_c, block_q), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bc_total * bq_total * ls * lq * d * 2,
            bytes_accessed=(bc_total * ls + bq_total * lq) * d * 4
            + bc_total * bq_total * 4,
            transcendentals=bc_total * bq_total * lq * ls,
        ),
    )(context, query, ctx_mask[:, None, :])
    return out.transpose(0, 2, 1, 3).reshape(bc_total, bq_total)


def _choose_blocks(ls: int, lq: int, n_c: int, n_q: int) -> Tuple[int, int]:
    """Pick tile sizes: the kernel's working set is one (bq*lq, ls) fp32
    matrix (plus a few copies), so bound bq by a ~2.4 MB budget; bc only
    controls input-block reuse."""
    # VMEM must hold double-buffered input blocks AND the working matrices:
    # qry block bq*lq*d, its normalized copy, the (bq*lq, ls) attention and
    # its softmax/focal copies. 160k elements (~0.6 MB fp32) per bq*lq*max
    # keeps the scoped total well under the 16 MB limit.
    budget = 160_000  # elements
    dim = 256
    bq = 1
    for cand in (16, 8, 4, 2, 1):
        if cand * lq * max(ls, dim) <= budget and n_q % cand == 0:
            bq = cand
            break
    bc = 8 if n_c % 8 == 0 else (4 if n_c % 4 == 0 else 1)
    return bc, bq


def _direction_sim(
    context, query, ctx_mask, lam, focal_equal, interpret=False
):
    """Padded + blocked wrapper around the kernel: sim (n_ctx, n_query)."""
    n_c, ls_real, d = context.shape
    n_q, lq_real, _ = query.shape
    # both padded axes keep 128 alignment: ls is the lane (minor) axis, and
    # 8-aligned-only lq was observed to blow up Mosaic compile times
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
