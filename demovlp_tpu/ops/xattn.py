"""Cross-modal (region <-> word) attention similarity — the local-loss kernel.

This is the semantic core of the RWA local alignment loss and of the local
half of retrieval evaluation. Behavior spec: reference model/loss.py
`func_attention_fast` (:209-271), `focal_equal` (:274-283) and
`xattn_score_fast` (:294-330). The math, including its quirks, is preserved
exactly; the implementation is a fused einsum formulation that XLA maps onto
the MXU, with an optional Pallas tiled kernel (see ops/pallas_xattn.py)
selected by `demovlp_tpu.ops.xattn.set_backend`.

Shapes (all fixed / static):
  query    (Bq, Lq, D)   e.g. captions (B, W, 256) or regions (B, R, 256)
  context  (Bc, Ls, D)
  *_mask   additive masks: 0 for valid, -100 for pad (see ops/masking.py)

Documented reference quirks that we replicate bit-for-bit:
  * The query-side additive mask is a mathematical no-op: it adds a constant
    per softmax row (softmax is over the source axis), so it cancels. It is
    kept in the signature for parity and because focal re-weighting happens
    *after* the softmax.
  * The per-position cosine similarity is averaged over ALL query positions,
    including padded ones (loss.py:317-318,326-327 mean over dim=-1 with no
    mask).
  * `cap_lens` (text lengths) are threaded through the reference call chain
    but never used (loss.py:294-330); we drop the argument.
  * `xattn_score(images, captions, ...)` returns t2i_sim.T + i2t_sim with
    shape (n_images, n_captions).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from demovlp_tpu.ops.masking import l2norm
from demovlp_tpu.ops.similarity import cosine_similarity

_BACKEND = os.environ.get("DEMOVLP_XATTN_BACKEND", "xla")  # "xla" | "pallas"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "auto"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def focal_equal(attn):
    """Equal-confidence relevance indicator H(x) = 1[attn > mean(attn)]
    (reference model/loss.py:274-283: funcF = attn * L - sum(attn))."""
    source_l = attn.shape[-1]
    func_f = attn * source_l - jnp.sum(attn, axis=-1, keepdims=True)
    return (func_f > 0).astype(attn.dtype)


def _re_attention(
    query_n,
    context_n,
    query_mask,
    context_mask,
    lambda_softmax: float,
    focal_type: str,
):
    """Shared core of func_attention / the Gram-form score: the focal
    re-attention distribution over context positions.

    Args are the ALREADY l2-normalized (Bq, Lq, D) query / (Bc, Ls, D)
    context. Returns (re_attn, attn0), both (Bc, Bq, Lq, Ls); attn0 is the
    raw normalized-embedding dot product (= cosine), which the Gram-form
    caller reuses for the similarity numerator.
    """
    # (Bc, Bq, Lq, Ls) raw attention logits — emitted directly in the layout
    # the softmax needs. (The reference computes (...,Ls,Lq) and transposes,
    # loss.py:230-240; on TPU that materialized an explicit O(B^2 L^2) copy
    # — ~10% of the train step in the device profile. Same math: the l2norm
    # over the query axis just moves from the last axis to axis 2.)
    attn0 = jnp.einsum("csd,qld->cqls", context_n, query_n)
    attn = jax.nn.leaky_relu(attn0, negative_slope=0.1)
    # l2norm over the *query* axis — reference loss.py:238 (l2norm(attn, 3))
    attn = l2norm(attn, axis=2)
    # cast masks to the compute dtype: f32 masks would silently promote the
    # whole O(B^2) pipeline back to f32 under jnp type promotion
    query_mask = query_mask.astype(attn.dtype)
    context_mask = context_mask.astype(attn.dtype)
    attn = attn + query_mask[None, :, :, None] + context_mask[:, None, None, :]
    attn = jax.nn.softmax(attn * lambda_softmax, axis=-1)

    if focal_type == "equal":
        func_h = focal_equal(attn)
    else:
        func_h = 1.0

    tmp_attn = func_h * attn
    attn_sum = jnp.sum(tmp_attn, axis=-1, keepdims=True)
    # 0/0 guard: an exactly-uniform softmax row makes focal_equal's func_h
    # all-zero (func_f == 0 everywhere, strict >). Exact uniformity is
    # routine under bf16 rounding and possible in f32 (all-padded source
    # rows). The funcF -> 0+ limit is uniform re-attention, i.e. attn
    # itself. where-selects, not eps: XLA's reciprocal rewrite turns
    # x/(sum+eps) into NaN-producing code when sum == 0 (BENCH_NOTES.md).
    ok = attn_sum > 0
    re_attn = jnp.where(ok, tmp_attn, attn) / jnp.where(
        ok, attn_sum, jnp.sum(attn, axis=-1, keepdims=True)
    )
    return re_attn, attn0


def func_attention(
    query,
    context,
    query_mask,
    context_mask,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
):
    """All-pairs cross attention: for every (context item c, query item q),
    attend each query position over the context positions and return the
    attention-weighted (l2-normalized) context.

    Runs in the dtype of `query`/`context` (masks are cast to match): the
    O(B^2 * Lq * Ls) intermediates dominate HBM traffic, so bfloat16 inputs
    halve the loss's memory cost (see `xattn_score(compute_dtype=...)`).

    Args:
      query: (Bq, Lq, D)
      context: (Bc, Ls, D)
      query_mask: additive (Bq, Lq)   [no-op; kept for parity]
      context_mask: additive (Bc, Ls)
    Returns:
      weighted context (Bc, Bq, Lq, D)
    """
    query = l2norm(query, axis=-1)
    context = l2norm(context, axis=-1)
    re_attn, _ = _re_attention(
        query, context, query_mask, context_mask, lambda_softmax, focal_type
    )
    # weighted ctx over source positions: (Bc, Bq, Lq, D)
    return jnp.einsum("cqls,csd->cqld", re_attn, context)


def _sim_one_direction_gram(
    query,
    context,
    query_mask,
    context_mask,
    lambda_softmax: float,
    focal_type: str,
    eps: float = 1e-8,
):
    """mean_l cos(query_ql, wei_cql) WITHOUT materializing the weighted
    context (Bc, Bq, Lq, D) tensor. Returns (Bc, Bq) float32.

    Identity (reference model/loss.py:242-291 semantics): with
    qn = q/(|q|+e), cn = c/(|c|+e) and wei = sum_s re_attn * cn,
      q . wei   = (|q|+e) * sum_s re_attn * attn0          (attn0 = qn.cn)
      |wei|^2   = re_attn^T G re_attn,   G_st = cn_s . cn_t  (tiny Gram)
      cos       = (q.wei) / max(|q| * |wei|, eps)
    so the O(B^2 Lq D) weighted-context einsum + cosine (the HBM-dominant
    tensors of the local loss: ~840 MB bf16 at B=128, Lq=100, D=256) become
    one O(B^2 Lq Ls^2) Gram quadratic form with Ls <= 100 — ~40% of the
    MACs and ~1/8 of the HBM traffic. Same math to float-associativity;
    pinned against the torch reference by tests/test_reference_loss_parity.
    """
    qn = l2norm(query, axis=-1)
    cn = l2norm(context, axis=-1)
    re_attn, attn0 = _re_attention(
        qn, cn, query_mask, context_mask, lambda_softmax, focal_type
    )
    # numerator core + Gram quadratic form, f32-accumulated (strictly more
    # precise than the old bf16 dot-over-D; identical in f32 mode). The
    # (Bq, Lq) axes are flattened to one batch-row axis so every contraction
    # is a clean (Bc)-batched 3-D matmul / row dot — 4-D einsums here made
    # XLA pick transposed operand layouts (explicit (c,q,l,s) copy fusions
    # in the round-3 xplane trace).
    bc, bq, lq, ls = re_attn.shape
    re2 = re_attn.reshape(bc, bq * lq, ls)
    a02 = attn0.reshape(bc, bq * lq, ls)
    s = jnp.einsum("cns,cns->cn", re2, a02, preferred_element_type=jnp.float32)
    gram = jnp.einsum("csd,ctd->cst", cn, cn, preferred_element_type=jnp.float32)
    # h stays in compute dtype (MXU accumulates f32 internally either way);
    # only the final VPU dot carries f32 out — avoids an f32 (B^2,Lq,Ls)
    # intermediate + convert round-trip in bf16 mode
    h = jnp.einsum("cns,cst->cnt", re2, gram.astype(re2.dtype))
    w2sq = jnp.einsum("cnt,cnt->cn", h, re2, preferred_element_type=jnp.float32)
    w1 = jnp.linalg.norm(query.astype(jnp.float32), axis=-1)  # (Bq, Lq)
    w12 = (w1.reshape(1, bq * lq) + eps) * s
    w2 = jnp.sqrt(jnp.maximum(w2sq, 0.0))
    cos = w12 / jnp.maximum(w1.reshape(1, bq * lq) * w2, eps)
    return jnp.mean(cos.reshape(bc, bq, lq), axis=-1)  # (Bc, Bq)


def _xattn_score_xla(
    images,
    captions,
    img_mask,
    cap_mask,
    lambda_softmax: float,
    focal_type: str,
    compute_dtype=None,
):
    if compute_dtype is not None:
        images = images.astype(compute_dtype)
        captions = captions.astype(compute_dtype)
    if os.environ.get("DEMOVLP_XATTN_GRAM", "1") == "1":
        # Gram-form cosine: no (B^2, L, D) weighted-context tensors (see
        # _sim_one_direction_gram). DEMOVLP_XATTN_GRAM=0 re-ablates the
        # original weighted-context formulation.
        # i2t: attend caption words over image regions
        i2t_sim = _sim_one_direction_gram(
            captions, images, cap_mask, img_mask, lambda_softmax, focal_type
        )  # (n_img, n_cap)
        # t2i: attend image regions over caption words
        t2i_sim = _sim_one_direction_gram(
            images, captions, img_mask, cap_mask, lambda_softmax, focal_type
        )  # (n_cap, n_img)
        return t2i_sim.T + i2t_sim  # f32 (n_img, n_cap)
    # i2t: attend caption words over image regions
    wei_context = func_attention(
        captions, images, cap_mask, img_mask, lambda_softmax, focal_type
    )
    i2t_sim = cosine_similarity(captions[None], wei_context, axis=-1)
    # the position-mean is done in f32 (free: XLA fuses the upcast into the
    # reduction; the HBM-heavy 4-D intermediates above stay in compute dtype)
    i2t_sim = jnp.mean(i2t_sim.astype(jnp.float32), axis=-1)  # (n_img, n_cap)

    # t2i: attend image regions over caption words
    wei_context = func_attention(
        images, captions, img_mask, cap_mask, lambda_softmax, focal_type
    )
    t2i_sim = cosine_similarity(images[None], wei_context, axis=-1)
    t2i_sim = jnp.mean(t2i_sim.astype(jnp.float32), axis=-1)  # (n_cap, n_img)

    # sims always leave in f32: downstream contrastive CE / ranking metrics
    # stay full-precision regardless of the compute dtype
    return (t2i_sim.T + i2t_sim).astype(jnp.float32)  # (n_img, n_cap)


def xattn_score(
    images,
    captions,
    img_mask,
    cap_mask=None,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
    compute_dtype=None,
):
    """Symmetric local similarity matrix between image (region) sets and
    caption (word) sets. Returns (n_images, n_captions) in float32.

    compute_dtype: dtype for the O(B^2) attention pipeline (XLA backend).
    `jnp.bfloat16` halves the HBM traffic of the training local loss (the
    towers already run bf16, so the embeddings carry bf16 information
    content); sims, softmax-CE and ranking stay f32. None = input dtype
    (f32 everywhere by default — the reference trains in pure f32).

    Args:
      images: (Ni, R, D) local region embeddings
      captions: (Nc, W, D) local word embeddings
      img_mask: additive (Ni, R)
      cap_mask: additive (Nc, W); defaults to all-valid (zeros), matching
        loss.py:307-308 (ones -> but used additively after the caller's
        (m-1)*100 transform; `None` there produced a *binary* ones mask added
        as-is, i.e. constant per row = softmax no-op, so zeros is equivalent).
    """
    if cap_mask is None:
        cap_mask = jnp.zeros(captions.shape[:2], dtype=images.dtype)
    backend = _BACKEND
    if backend == "auto":
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    if backend == "pallas":
        from demovlp_tpu.ops.pallas_xattn import xattn_score_pallas

        # compute_dtype=bfloat16 -> MXU-native bf16 matmul operands + bf16
        # input tiles with f32 accumulators and f32 VPU stages (see
        # pallas_xattn.xattn_score_pallas) — the kernel's analog of the XLA
        # path's bf16 pipeline, and strictly more precise than it
        return xattn_score_pallas(
            images, captions, img_mask, cap_mask, lambda_softmax, focal_type,
            compute_dtype,
        )
    return _xattn_score_xla(
        images, captions, img_mask, cap_mask, lambda_softmax, focal_type,
        compute_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "segment", "cap_segment", "lambda_softmax", "focal_type",
        "compute_dtype",
    ),
)
def xattn_score_blockwise(
    images,
    captions,
    img_mask,
    cap_mask,
    segment: int = 128,
    cap_segment: int = 0,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
    compute_dtype=None,
):
    """Memory-bounded all-pairs local similarity for evaluation.

    TPU-native replacement for the reference's serial host loop over 8x8
    blocks (model/loss.py:73-103): the image axis (and optionally the
    caption axis, `cap_segment` > 0) is scanned in blocks on device, each
    tile computed in one fused kernel. Wrap in shard_map to split image
    blocks across a mesh (see parallel/sharded_eval.py).

    `images` rows must be a multiple of `segment` (pad + trim at the
    caller); same for captions/`cap_segment` when caption blocking is on.
    """
    n_img = images.shape[0]
    n_cap = captions.shape[0]
    assert n_img % segment == 0, (n_img, segment)
    n_blocks = n_img // segment

    img_blocks = images.reshape(n_blocks, segment, *images.shape[1:])
    mask_blocks = img_mask.reshape(n_blocks, segment, img_mask.shape[1])

    # remat each block: without this, grad-of-scan stacks every block's
    # (segment, n_cap, Lq, D) residuals — the memory the blocking exists
    # to avoid. Backward recomputes one block at a time instead.
    score_fn = jax.checkpoint(
        functools.partial(
            xattn_score, lambda_softmax=lambda_softmax, focal_type=focal_type,
            compute_dtype=compute_dtype,
        )
    )

    if cap_segment and cap_segment < n_cap:
        assert n_cap % cap_segment == 0, (n_cap, cap_segment)
        m_blocks = n_cap // cap_segment
        cap_blocks = captions.reshape(m_blocks, cap_segment, *captions.shape[1:])
        cmask_blocks = cap_mask.reshape(m_blocks, cap_segment, cap_mask.shape[1])

        def tile_fn(imgs, masks):
            def inner(carry, cblk):
                caps, cmasks = cblk
                sims = score_fn(imgs, caps, masks, cmasks)
                return carry, sims

            _, tiles = jax.lax.scan(inner, None, (cap_blocks, cmask_blocks))
            # (m_blocks, segment, cap_segment) -> (segment, n_cap)
            return tiles.transpose(1, 0, 2).reshape(segment, n_cap)

        def block_fn(carry, blk):
            imgs, masks = blk
            return carry, tile_fn(imgs, masks)

    else:

        def block_fn(carry, blk):
            imgs, masks = blk
            sims = score_fn(imgs, captions, masks, cap_mask)
            return carry, sims

    _, sims = jax.lax.scan(block_fn, None, (img_blocks, mask_blocks))
    return sims.reshape(n_img, n_cap)
