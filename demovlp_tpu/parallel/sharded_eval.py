"""Mesh-sharded all-pairs local-similarity evaluation.

Replaces the reference's serial single-device 8x8 host loop
(model/loss.py:73-103, N^2/64 kernel launches with host round-trips): the
gallery (video) axis is padded and split over the mesh's 'data' axis with
shard_map; each device scans its row block against the full (replicated)
caption set with the fused xattn kernel; the assembled matrix comes back
sharded and is gathered once.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from demovlp_tpu.ops.xattn import xattn_score_blockwise
from demovlp_tpu.parallel.mesh import DATA_AXIS


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


def sharded_local_sims(
    img_feats,
    lang_feats,
    img_mask,
    lang_mask,
    mesh: Mesh,
    segment: int = 64,
    cap_segment: int = 0,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
    backend: str | None = None,
) -> np.ndarray:
    """Full (n_videos, n_texts) local similarity matrix on the mesh.

    Args (host numpy or jax arrays):
      img_feats (Ni, R, D), lang_feats (Nc, W, D),
      img_mask additive (Ni, R), lang_mask additive (Nc, W)
    """
    img_feats = np.asarray(img_feats, dtype=np.float32)
    lang_feats = np.asarray(lang_feats, dtype=np.float32)
    img_mask = np.asarray(img_mask, dtype=np.float32)
    lang_mask = np.asarray(lang_mask, dtype=np.float32)

    n_img = img_feats.shape[0]
    n_cap = lang_feats.shape[0]
    from demovlp_tpu.ops.xattn import get_backend

    if backend is None:
        backend = get_backend()
    if backend == "auto":
        # measured on v5e (BENCH_NOTES.md): the fused Pallas kernel is faster
        # AND memory-bounded by construction at gallery scale; CPU (tests)
        # can't run compiled Mosaic, so it keeps the XLA path. Above the
        # scale the kernel has been hardware-validated at (4k x 4k), auto
        # stays on the XLA blockwise path: a 10k x 10k pallas run produced a
        # TPU worker crash ("kernel fault") under the axon runtime — until
        # that is root-caused, auto must never risk taking the chip down.
        big = n_img * n_cap > 16_000_000
        backend = (
            "pallas"
            if jax.default_backend() != "cpu" and not big
            else "xla"
        )
    # caption blocking keeps the per-tile (seg, cap_seg, Lq, Ls) intermediate
    # bounded on the non-fused (XLA) backend for large galleries
    if cap_segment == 0 and backend == "xla" and n_cap > 256:
        cap_segment = 128
    if cap_segment:
        pad_cap = -(-n_cap // cap_segment) * cap_segment - n_cap
        if pad_cap:
            lang_feats = np.pad(
                np.asarray(lang_feats, np.float32),
                ((0, pad_cap), (0, 0), (0, 0)),
            )
            lang_mask = np.pad(
                np.asarray(lang_mask, np.float32),
                ((0, pad_cap), (0, 0)),
                constant_values=-100.0,
            )
    n_dev = mesh.shape[DATA_AXIS]
    # pad the gallery axis to an equal per-device share only (< n_dev fake
    # rows); the scan segment is then shrunk to the largest divisor of the
    # share, instead of padding the share up to a segment multiple (which
    # wasted up to n_dev*segment-1 rows of eval compute at MSRVTT-1k scale)
    per_dev = -(-n_img // n_dev)
    if backend != "pallas":
        segment = min(segment, per_dev)
        while per_dev % segment:
            segment -= 1
    # pad masks with -100 (all-padded row) so fake galleries are inert
    total = per_dev * n_dev
    img_feats_p = _pad_to(img_feats, total)
    img_mask_p = np.full((total, img_mask.shape[1]), -100.0, dtype=np.float32)
    img_mask_p[:n_img] = img_mask

    if backend == "pallas":
        # the fused kernel tiles internally — no outer scan needed (and
        # scan+shard_map nesting around pallas_call compiles pathologically)
        from demovlp_tpu.ops.pallas_xattn import xattn_score_pallas

        def per_shard(im, la, ima, lam):
            return xattn_score_pallas(im, la, ima, lam, lambda_softmax, focal_type)

    else:

        def per_shard(im, la, ima, lam):
            return xattn_score_blockwise(
                im, la, ima, lam,
                segment=segment,
                cap_segment=cap_segment,
                lambda_softmax=lambda_softmax,
                focal_type=focal_type,
            )

    @functools.partial(
        jax.jit,
        in_shardings=(
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P()),
        ),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )
    def compute(imgs, langs, imasks, lmasks):
        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )
        return fn(imgs, langs, imasks, lmasks)

    sims = compute(img_feats_p, lang_feats, img_mask_p, lang_mask)
    return np.asarray(sims)[:n_img, :n_cap]
