"""Pallas TPU kernels: fused cross-modal (RWA) attention similarity, forward
AND backward.

Fuses the whole func_attention -> cosine -> mean pipeline of
reference model/loss.py:209-330 into one VMEM-resident kernel per
(context-block x query-block) grid tile, so the (Bc, Bq, Lq, Ls) attention
tensor is never materialized in HBM. For a B=128 pre-train batch that tensor
is ~194 MB fp32 per direction — on XLA the op is HBM-bandwidth bound (every
elementwise stage re-streams it); fused, HBM traffic reduces to the
embedding blocks plus a (Bc, Bq) output tile.

Layout strategy: all matmuls are 2-D (block_q*Lq, D) x (D, Ls) MXU ops; the
softmax/renorm run on a (block_q*Lq, Ls) view so the reduction axis is
minor. Callers pad Lq and Ls to lane multiples; padding is exact (not
approximate) because
  * zero query vectors contribute zero to the leaky-relu'd l2norm over Lq
    and produce cos = 0 terms, so sums over Lq are unchanged and the mean
    divides by the REAL Lq;
  * padded context positions carry a -100 additive mask (suppressed by the
    lambda=20 softmax to ~1e-800) and the focal threshold uses the REAL Ls.
A re-attention denominator guard (max(sum, 1e-30)) protects the exactly-
uniform rows padding creates; real rows are untouched.

Gradients: jax.custom_vjp on the per-direction padded sim with two analytic
Pallas backward kernels — one accumulating d_context over query blocks, one
accumulating d_query over context blocks (two kernels because a Pallas TPU
output block may only be revisited on consecutive grid steps, and the two
gradients want opposite inner loops). Each recomputes the tile forward in
VMEM (flash-attention style): no residuals beyond the inputs are saved.
Gradients w.r.t. padded Lq/Ls positions and padded batch rows are garbage by
construction and sliced off; the d/dmask cotangent is zero (masks are data).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_TINY = 1e-30


def _exp_softmax(a, lam):
    """softmax(lam * a) without the max-subtraction pass: a = l2-normalized
    attention (|a| <= ~1) plus a -100 additive mask, so lam*a ∈ [-2020, ~20]
    — exp() is exact-fp32-safe (masked lanes underflow to exactly 0). Rows
    that are fully masked (padded context items) get p = 0 instead of
    uniform; their downstream sim is 0 either way and, unlike a 0/0 NaN,
    zeros cannot contaminate the backward matmuls."""
    e = jnp.exp(a * lam)
    s = jnp.sum(e, -1, keepdims=True)
    s_pos = s > 0
    return jnp.where(s_pos, e / jnp.where(s_pos, s, 1.0), 0.0)


def _normalize_rows(x, axis=-1):
    return x / (jnp.sqrt(jnp.sum(x * x, axis, keepdims=True)) + _EPS)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _out_q(bq_total: int, block_q: int) -> int:
    """Width of the forward output tile: 128 lanes when the query axis is
    long enough (dense physical layout), else the whole (padded) axis."""
    return 128 if bq_total >= 128 else bq_total


def _pad_axis(x, axis: int, target: int, value=0.0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _dotT(a, b):
    """(N, K)ᵀ-contracted product: (N, A) x (N, B) -> (A, B) on the MXU."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ===================================================================== fwd
def _fa_sim_kernel(
    ctx_ref, qry_ref, cmask_ref, out_ref, *, lam, focal_equal, ls_real,
    lq_real, mxu_bf16=False,
):
    """One (BC, BQ) tile of sim[c, q] = mean_l cos(q_l, wctx_{c,q,l}).

    Transpose-free: the context block is processed one item at a time so the
    working set stays a (bq*lq, ls) matrix whose reductions land on natural
    axes — l2norm over lq is a per-query-group sublane reduction, the
    softmax/focal renorm are lane (minor-axis) reductions, and both matmuls
    are plain 2-D MXU ops.

    Output: a (block_c, out_q) lane-aligned block shared by `out_q//bq`
    consecutive inner grid steps; each step scatters its (block_c, bq) strip
    of sims into the block with a one-hot matmul (no dynamic lane slicing).
    Decoupling the output tile width (out_q, 128-aligned) from the query
    tile (bq, VMEM-bounded) keeps the output array DENSE: the previous
    (grid_i, grid_j, block_c, bq) tile-array layout physically padded bq up
    to 128 lanes — 64x HBM blowup (25.6 GB for a 10k x 10k gallery)."""
    bc, ls, d = ctx_ref.shape
    bq, lq, _ = qry_ref.shape
    out_q = out_ref.shape[-1]
    n = bq * lq
    inner = out_q // bq

    if inner > 1:

        @pl.when(pl.program_id(2) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

    # bf16 MXU mode: every matmul takes bf16 operands with an f32
    # accumulator (the MXU's native fast path — f32 inputs run at a
    # fraction of the bf16 rate); all VPU elementwise/softmax/renorm work
    # stays f32, so this is strictly MORE precise than the XLA
    # local_dtype=bfloat16 pipeline it competes with (which runs the whole
    # O(B^2) pipeline in bf16).
    mxu = jnp.bfloat16 if mxu_bf16 else jnp.float32
    q = qry_ref[...].astype(jnp.float32)
    qn_flat = _normalize_rows(q).reshape(n, d)
    qf = q.reshape(n, d)
    q_norm = jnp.sqrt(jnp.sum(qf * qf, -1))  # (n,)
    qn_mx = qn_flat.astype(mxu)

    # one big raw-attention matmul for the whole context block: the per-ci
    # (n, d) x (d, ls) products under-fill the MXU; (n, d) x (d, bc*ls) is
    # bc-fold wider and per-ci views are aligned lane slices
    cn_all = _normalize_rows(ctx_ref[...].astype(jnp.float32))  # (bc, ls, d)
    cn_mx_all = cn_all.astype(mxu)
    a_all = jnp.dot(
        qn_mx, cn_mx_all.reshape(bc * ls, d).T,
        preferred_element_type=jnp.float32,
    )  # (n, bc*ls)

    rows = []
    for ci in range(bc):  # static unroll over the context block
        cmask = cmask_ref[ci, 0, :]  # (ls,)
        cn_mx = cn_mx_all[ci]

        a = a_all[:, ci * ls : (ci + 1) * ls]
        a = jnp.where(a >= 0, a, 0.1 * a)
        # l2norm over lq: per (q, s) across the lq rows of each query group
        sq = jnp.sum(a.reshape(bq, lq, ls) ** 2, axis=1, keepdims=True)
        a = (a.reshape(bq, lq, ls) / (jnp.sqrt(sq) + _EPS)).reshape(n, ls)
        a = a + cmask[None, :]
        p = _exp_softmax(a, lam)
        if focal_equal:
            h = ((p * ls_real - jnp.sum(p, -1, keepdims=True)) > 0).astype(
                p.dtype
            )
            p = h * p
            s = jnp.sum(p, -1, keepdims=True)
            s_pos = s > 0
            p = jnp.where(s_pos, p / jnp.where(s_pos, s, 1.0), 0.0)
        # weighted context (n, d) then cosine with the raw query
        w = jnp.dot(p.astype(mxu), cn_mx, preferred_element_type=jnp.float32)
        num = jnp.sum(w * qf, -1)
        den = jnp.sqrt(jnp.sum(w * w, -1)) * q_norm
        cos = num / jnp.maximum(den, _EPS)
        sim = jnp.sum(cos.reshape(bq, lq), axis=-1) / lq_real  # (bq,)
        rows.append(sim)
    tile = jnp.stack(rows, axis=0)  # (bc, bq)

    if inner == 1:
        out_ref[0, 0] = tile
    else:
        # scatter the (bc, bq) strip to columns [ji*bq, (ji+1)*bq) of the
        # (bc, out_q) block with a one-hot matmul: onehot[r, ji*bq + r] = 1
        ji = pl.program_id(2)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, out_q), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, out_q), 0)
        onehot = (col == ji * bq + row).astype(jnp.float32)
        out_ref[0, 0] += jnp.dot(
            tile, onehot, preferred_element_type=jnp.float32
        )


def _fa_sim_pallas(
    context, query, ctx_mask, lam: float, focal_equal: bool,
    ls_real: int, lq_real: int, block_c: int, block_q: int,
    interpret: bool = False, mxu_bf16: bool = False,
):
    """sim (Bc, Bq) with padded inputs; Bc % block_c == 0,
    Bq % out_q(block_q) == 0 (see _out_q)."""
    bc_total, ls, d = context.shape
    bq_total, lq, _ = query.shape
    out_q = _out_q(bq_total, block_q)
    inner = out_q // block_q
    grid = (bc_total // block_c, bq_total // out_q, inner)

    kernel = functools.partial(
        _fa_sim_kernel,
        lam=lam,
        focal_equal=focal_equal,
        ls_real=ls_real,
        lq_real=lq_real,
        mxu_bf16=mxu_bf16,
    )
    # output is a (grid_i, grid_jo, block_c, out_q) tile array: the block
    # spans the trailing dims (Mosaic rule) and out_q is 128-lane aligned,
    # so the physical layout is dense; `inner` consecutive grid steps share
    # one output block (see _fa_sim_kernel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_c, ls, d), lambda i, jo, ji: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_q, lq, d),
                lambda i, jo, ji, _inner=inner: (jo * _inner + ji, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_c, 1, ls), lambda i, jo, ji: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_c, out_q),
            lambda i, jo, ji: (i, jo, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid[0], grid[1], block_c, out_q), jnp.float32
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


# ===================================================================== bwd
def _fa_bwd_tile(
    cn, cmask, a0, qn_flat, qf, q_norm, g_col, *, lam, focal_equal, ls_real,
    lq_real, bq, lq, mxu=jnp.float32,
):
    """Recompute one context item's forward in VMEM and return the backward
    chain products (dqf_total, dcn_total) for that item against the whole
    query block. a0: the (n, ls) raw-attention slice from the per-tile
    batched matmul; g_col: (bq, 1) incoming cotangent column of sim[ci, :];
    q_norm: (n, 1) column.

    Mosaic layout note: every per-row scalar is kept as an (n, 1) column —
    a (bq, lq) -> (bq*lq,) reshape collapses the lane axis, which Mosaic's
    vector layout inference rejects ("unsupported shape cast"); collapsing
    leading axes with the lane axis intact is supported."""
    ls = cn.shape[0]
    n = bq * lq

    # ---------------- forward recompute (mirrors _fa_sim_kernel exactly)
    a1 = jnp.where(a0 >= 0, a0, 0.1 * a0)
    a1_3 = a1.reshape(bq, lq, ls)
    sq = jnp.sum(a1_3 * a1_3, axis=1, keepdims=True)  # (bq, 1, ls)
    r = jnp.sqrt(sq) + _EPS
    a2 = (a1_3 / r).reshape(n, ls)
    a3 = a2 + cmask[None, :]
    p = _exp_softmax(a3, lam)
    # NOTE on guards: XLA compiles x / tiny via reciprocal approximation, so
    # 0 / 1e-30 evaluates to 0 * inf = NaN under jit. Every "padded row"
    # guard below is therefore a where-select on the exact zero condition,
    # never a maximum(denominator, tiny).
    if focal_equal:
        h = ((p * ls_real - jnp.sum(p, -1, keepdims=True)) > 0).astype(p.dtype)
        pt = h * p
        s = jnp.sum(pt, -1, keepdims=True)
        s_pos = s > 0
        ph = jnp.where(s_pos, pt / jnp.where(s_pos, s, 1.0), 0.0)
    else:
        ph = p
    cn_mx = cn.astype(mxu)
    w = jnp.dot(ph.astype(mxu), cn_mx, preferred_element_type=jnp.float32)  # (n, d)
    num = jnp.sum(w * qf, -1, keepdims=True)  # (n, 1)
    wn = jnp.sqrt(jnp.sum(w * w, -1, keepdims=True))
    den_raw = wn * q_norm
    den = jnp.maximum(den_raw, _EPS)

    # ---------------- backward
    # sim[ci, q] = sum_l cos / lq_real
    dcos = (
        jnp.broadcast_to(g_col[:, None, :], (bq, lq, 1)).reshape(n, 1)
        / lq_real
    )
    live = (den_raw >= _EPS).astype(jnp.float32)
    dnum = dcos / den
    dden = -dcos * num / (den * den) * live
    # cos = num / max(|w|*|q|, eps)
    wn_pos = wn > 0
    q_pos = q_norm > 0
    dw = dnum * qf + jnp.where(
        wn_pos, dden * q_norm / jnp.where(wn_pos, wn, 1.0), 0.0
    ) * w
    dqf = dnum * w + jnp.where(
        q_pos, dden * wn / jnp.where(q_pos, q_norm, 1.0), 0.0
    ) * qf

    # w = ph @ cn
    dph = jnp.dot(
        dw.astype(mxu), cn_mx.T, preferred_element_type=jnp.float32
    )  # (n, ls)

    if focal_equal:
        # ph = pt / sum(pt); h is a non-differentiable indicator
        dot_ps = jnp.sum(dph * ph, -1, keepdims=True)
        dpt = jnp.where(
            s_pos, (dph - dot_ps) / jnp.where(s_pos, s, 1.0), 0.0
        )
        dp = h * dpt
    else:
        dp = dph
    # softmax over ls at temperature lam
    da3 = lam * p * (dp - jnp.sum(dp * p, -1, keepdims=True))
    da2_3 = da3.reshape(bq, lq, ls)
    # a2 = a1 / (sqrt(sq) + eps), sq = sum_l a1^2. Divisions are sequenced
    # (never a product of tiny denominators): r^2 * sqrt_sq underflows fp32
    # to 0 on fully-padded columns and would turn 0/0 into NaN.
    t = jnp.sum(da2_3 * a1_3, axis=1, keepdims=True)  # (bq, 1, ls)
    sq_pos = sq > 0
    sqrt_sq = jnp.where(sq_pos, r - _EPS, 1.0)
    a2_3 = a1_3 / r
    ratio = jnp.where(sq_pos, t / r / sqrt_sq, 0.0)
    da1_3 = da2_3 / r - ratio * a2_3
    da1 = da1_3.reshape(n, ls)
    da0 = jnp.where(a0 >= 0, da1, 0.1 * da1)
    # a0 = qn @ cnᵀ
    dqn = jnp.dot(da0.astype(mxu), cn_mx, preferred_element_type=jnp.float32)  # (n, d)
    # dcn = phᵀ·dw + da0ᵀ·qn, stacked along n into one MXU contraction
    dcn = _dotT(
        jnp.concatenate([ph, da0], axis=0).astype(mxu),
        jnp.concatenate([dw, qn_flat], axis=0).astype(mxu),
    )  # (ls, d)

    # qn = qf / (|qf| + eps)
    qn_den = q_norm + _EPS
    dot_qq = jnp.sum(dqn * qf, -1, keepdims=True)
    coef = jnp.where(
        q_pos, dot_qq / jnp.where(q_pos, q_norm, 1.0) / (qn_den * qn_den), 0.0
    )
    dqf = dqf + dqn / qn_den - coef * qf
    return dqf, dcn


def _cn_to_c_grad(dcn, c):
    """Backward of cn = c / (|c| + eps), applied once per context item (the
    map is linear in dcn, so per-tile application + summation is exact)."""
    c_norm = jnp.sqrt(jnp.sum(c * c, -1, keepdims=True))  # (ls, 1)
    den = c_norm + _EPS
    dot_cc = jnp.sum(dcn * c, -1, keepdims=True)
    c_pos = c_norm > 0
    coef = jnp.where(
        c_pos, dot_cc / jnp.where(c_pos, c_norm, 1.0) / (den * den), 0.0
    )
    return dcn / den - coef * c


def _fa_bwd_dq_kernel(
    ctx_ref, qry_ref, cmask_ref, g_ref, dq_ref, *, lam, focal_equal,
    ls_real, lq_real, mxu_bf16=False,
):
    """d_query tile, accumulated over context blocks (grid = (jq, ic), ic
    innermost so the output block stays resident)."""
    bc, ls, d = ctx_ref.shape
    bq, lq, _ = qry_ref.shape
    mxu = jnp.bfloat16 if mxu_bf16 else jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    q = qry_ref[...].astype(jnp.float32)
    q_norm_k = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
    qn_flat = (q / (q_norm_k + _EPS)).reshape(bq * lq, d)
    qf = q.reshape(bq * lq, d)
    q_norm = q_norm_k.reshape(bq * lq, 1)  # (n, 1) column (Mosaic layout)

    cn_all = _normalize_rows(ctx_ref[...].astype(jnp.float32))  # (bc, ls, d)
    a_all = jnp.dot(
        qn_flat.astype(mxu), cn_all.reshape(bc * ls, d).T.astype(mxu),
        preferred_element_type=jnp.float32,
    )  # (n, bc*ls): one batched raw-attention matmul per tile

    gt = g_ref[0, 0]  # (bq, bc): query axis on sublanes, ctx on lanes
    acc = jnp.zeros((bq * lq, d), jnp.float32)
    for ci in range(bc):
        dqf, _ = _fa_bwd_tile(
            cn_all[ci], cmask_ref[ci, 0, :],
            a_all[:, ci * ls : (ci + 1) * ls],
            qn_flat, qf, q_norm, gt[:, ci : ci + 1],
            lam=lam, focal_equal=focal_equal, ls_real=ls_real,
            lq_real=lq_real, bq=bq, lq=lq, mxu=mxu,
        )
        acc = acc + dqf
    dq_ref[...] += acc.reshape(bq, lq, d)


def _fa_bwd_dc_kernel(
    ctx_ref, qry_ref, cmask_ref, g_ref, dc_ref, *, lam, focal_equal,
    ls_real, lq_real, mxu_bf16=False,
):
    """d_context tile, accumulated over query blocks (grid = (ic, jq), jq
    innermost)."""
    bc, ls, d = ctx_ref.shape
    bq, lq, _ = qry_ref.shape
    mxu = jnp.bfloat16 if mxu_bf16 else jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dc_ref[...] = jnp.zeros_like(dc_ref)

    q = qry_ref[...].astype(jnp.float32)
    q_norm_k = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
    qn_flat = (q / (q_norm_k + _EPS)).reshape(bq * lq, d)
    qf = q.reshape(bq * lq, d)
    q_norm = q_norm_k.reshape(bq * lq, 1)  # (n, 1) column (Mosaic layout)

    ctx_f32 = ctx_ref[...].astype(jnp.float32)
    cn_all = _normalize_rows(ctx_f32)  # (bc, ls, d)
    a_all = jnp.dot(
        qn_flat.astype(mxu), cn_all.reshape(bc * ls, d).T.astype(mxu),
        preferred_element_type=jnp.float32,
    )  # (n, bc*ls)

    gt = g_ref[0, 0]  # (bq, bc)
    for ci in range(bc):
        _, dcn = _fa_bwd_tile(
            cn_all[ci], cmask_ref[ci, 0, :],
            a_all[:, ci * ls : (ci + 1) * ls],
            qn_flat, qf, q_norm, gt[:, ci : ci + 1],
            lam=lam, focal_equal=focal_equal, ls_real=ls_real,
            lq_real=lq_real, bq=bq, lq=lq, mxu=mxu,
        )
        dc_ref[ci] += _cn_to_c_grad(dcn, ctx_f32[ci])


def _fa_bwd_pallas(
    context, query, ctx_mask, g, lam, focal_equal, ls_real, lq_real,
    block_c: int, block_q: int, interpret: bool = False,
    mxu_bf16: bool = False,
):
    """(d_context, d_query) on padded inputs via the two accumulation kernels."""
    bc_total, ls, d = context.shape
    bq_total, lq, _ = query.shape
    n_cb = bc_total // block_c
    n_qb = bq_total // block_q
    cmask3 = ctx_mask[:, None, :]
    # pre-tile g to (n_cb, n_qb, block_q, block_c): trailing dims equal the
    # block's (Mosaic tiling rule) AND transposed so the kernel can slice a
    # (block_q, 1) cotangent column without moving the lane axis
    g4 = g.reshape(n_cb, block_c, n_qb, block_q).transpose(0, 2, 3, 1)
    common = dict(
        lam=lam, focal_equal=focal_equal, ls_real=ls_real, lq_real=lq_real,
        mxu_bf16=mxu_bf16,
    )
    bwd_cost = pl.CostEstimate(
        flops=6 * bc_total * bq_total * ls * lq * d * 2,
        bytes_accessed=(bc_total * ls + bq_total * lq) * d * 8
        + bc_total * bq_total * 4,
        transcendentals=2 * bc_total * bq_total * lq * ls,
    )

    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, **common),
        grid=(n_qb, n_cb),  # ic innermost: accumulate dq[jq] over ctx blocks
        in_specs=[
            pl.BlockSpec((block_c, ls, d), lambda jq, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, lq, d), lambda jq, ic: (jq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1, ls), lambda jq, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, block_c),
                         lambda jq, ic: (ic, jq, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, lq, d), lambda jq, ic: (jq, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bq_total, lq, d), jnp.float32),
        interpret=interpret,
        cost_estimate=bwd_cost,
    )(context, query, cmask3, g4)

    dc = pl.pallas_call(
        functools.partial(_fa_bwd_dc_kernel, **common),
        grid=(n_cb, n_qb),  # jq innermost: accumulate dc[ic] over query blocks
        in_specs=[
            pl.BlockSpec((block_c, ls, d), lambda ic, jq: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, lq, d), lambda ic, jq: (jq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1, ls), lambda ic, jq: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, block_c),
                         lambda ic, jq: (ic, jq, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_c, ls, d), lambda ic, jq: (ic, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc_total, ls, d), jnp.float32),
        interpret=interpret,
        cost_estimate=bwd_cost,
    )(context, query, cmask3, g4)
    return dc, dq


# ============================================================ padded op + vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _padded_direction_sim(
    context, query, ctx_mask, lam, focal_equal, ls_real, lq_real,
    block_c, block_q, interpret, mxu_bf16,
):
    return _fa_sim_pallas(
        context, query, ctx_mask, lam, focal_equal, ls_real, lq_real,
        block_c, block_q, interpret=interpret, mxu_bf16=mxu_bf16,
    )


def _pds_fwd(context, query, ctx_mask, *static):
    out = _padded_direction_sim(context, query, ctx_mask, *static)
    return out, (context, query, ctx_mask)


def _pds_bwd(lam, focal_equal, ls_real, lq_real, block_c, block_q, interpret,
             mxu_bf16, residuals, g):
    context, query, ctx_mask = residuals
    dc, dq = _fa_bwd_pallas(
        context, query, ctx_mask, g, lam, focal_equal, ls_real, lq_real,
        block_c, block_q, interpret=interpret, mxu_bf16=mxu_bf16,
    )
    # cotangents must match the primal dtypes (bf16 inputs in MXU-bf16 mode)
    return (
        dc.astype(context.dtype),
        dq.astype(query.dtype),
        jnp.zeros_like(ctx_mask),
    )


_padded_direction_sim.defvjp(_pds_fwd, _pds_bwd)


# ============================================================ blocking + pad
def _choose_blocks(
    ls: int, lq: int, n_c: int, n_q: int, budget: int = 160_000
) -> Tuple[int, int]:
    """Pick tile sizes: the kernel's working set is one (bq*lq, ls) fp32
    matrix (plus a few copies), so bound bq by an element budget; bc only
    controls input-block reuse. The backward keeps ~3x as many live
    matrices, so it passes a smaller budget."""
    dim = 256
    bq = 1
    for cand in (16, 8, 4, 2, 1):
        if cand * lq * max(ls, dim) <= budget and n_q % cand == 0:
            bq = cand
            break
    bc = 8 if n_c % 8 == 0 else (4 if n_c % 4 == 0 else 1)
    return bc, bq


def _direction_sim(
    context, query, ctx_mask, lam, focal_equal, interpret=False,
    mxu_bf16=False,
):
    """Padded + blocked wrapper around the kernels: sim (n_ctx, n_query),
    differentiable w.r.t. context and query."""
    n_c, ls_real, d = context.shape
    n_q, lq_real, _ = query.shape
    # ls is the lane (minor) axis: 128 alignment. lq only shapes the row
    # count (bq*lq sublanes), so 8 alignment suffices — padding it to 128
    # cost 4x rows (VPU passes AND matmul m-dim) for the 30-region direction
    ls = _round_up(max(ls_real, 8), 128)
    lq = _round_up(max(lq_real, 8), 8)
    # batch axes to a block multiple; backward gets a tighter VMEM budget
    # (it keeps ~3x the live matrices), so block on the smaller choice and
    # share it between fwd and bwd (the vjp must see one static blocking)
    block_c, block_q = _choose_blocks(
        ls, lq, _round_up(n_c, 8), _round_up(n_q, 8), budget=140_000
    )
    n_c_pad = _round_up(n_c, block_c)
    n_q_pad = _round_up(n_q, block_q)
    if n_q_pad >= 128:
        # the dense forward output tile is 128 lanes wide (see _out_q);
        # block_q always divides 128, so this stays a block_q multiple
        n_q_pad = _round_up(n_q_pad, 128)

    # MXU-bf16 mode ships the embedding tiles as bf16 too (halves the
    # HBM->VMEM input streams); all VPU math upcasts to f32 in-kernel
    io_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    ctx = _pad_axis(_pad_axis(context.astype(io_dtype), 1, ls), 0, n_c_pad)
    qry = _pad_axis(_pad_axis(query.astype(io_dtype), 1, lq), 0, n_q_pad)
    cm = _pad_axis(
        _pad_axis(ctx_mask.astype(jnp.float32), 1, ls, value=-100.0), 0, n_c_pad
    )
    sim = _padded_direction_sim(
        ctx, qry, cm, lam, focal_equal, ls_real, lq_real,
        block_c, block_q, interpret, mxu_bf16,
    )
    return sim[:n_c, :n_q]


def _xattn_score_pallas_impl(
    images, captions, img_mask, cap_mask, lam, focal_equal, interpret=False,
    mxu_bf16=False,
):
    i2t = _direction_sim(
        images, captions, img_mask, lam, focal_equal, interpret, mxu_bf16
    )
    t2i = _direction_sim(
        captions, images, cap_mask, lam, focal_equal, interpret, mxu_bf16
    )
    return t2i.T + i2t


def xattn_score_pallas(
    images, captions, img_mask, cap_mask,
    lambda_softmax: float = 20.0, focal_type: str = "prob",
    compute_dtype=None,
):
    """Drop-in replacement for ops.xattn._xattn_score_xla (same semantics,
    fused Pallas forward and analytic fused Pallas backward).

    compute_dtype=bfloat16 selects MXU-native bf16 matmul operands with f32
    accumulators and bf16 input tiles; every VPU stage (l2norms, softmax,
    focal renorm, cosine) stays f32 — more precise than the XLA
    local_dtype=bfloat16 pipeline, which runs everything in bf16."""
    mxu_bf16 = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
    return _xattn_score_pallas_impl(
        images, captions, img_mask, cap_mask,
        float(lambda_softmax), focal_type == "equal", mxu_bf16=mxu_bf16,
    )


def xattn_score_pallas_interpret(
    images, captions, img_mask, cap_mask,
    lambda_softmax: float = 20.0, focal_type: str = "prob",
    compute_dtype=None,
):
    """Interpreter-mode variant for CPU tests (forward and backward)."""
    mxu_bf16 = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16
    return _xattn_score_pallas_impl(
        images, captions, img_mask, cap_mask,
        float(lambda_softmax), focal_type == "equal", interpret=True,
        mxu_bf16=mxu_bf16,
    )
