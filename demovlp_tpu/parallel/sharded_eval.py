"""Mesh-sharded all-pairs local-similarity evaluation.

Replaces the reference's serial single-device 8x8 host loop
(model/loss.py:73-103, N^2/64 kernel launches with host round-trips): the
gallery (video) axis is padded and split over the mesh's 'data' axis with
shard_map; each device scans its row block against the full (replicated)
caption set with the fused xattn kernel; the assembled matrix comes back
sharded and is gathered once.

Large galleries are processed in HOST-LEVEL CHUNKS of the gallery axis
(default 4096 rows, DEMOVLP_EVAL_CHUNK): at 10k+ rows a single gallery
buffer exceeds 2 GiB and reproducibly crashes the TPU worker under the
axon runtime (both the Pallas and the XLA backend — it is the transfer,
not the kernel). Chunking bounds every device buffer and keeps each
dispatch at the hardware-validated scale; the caption set is transferred
to device ONCE and reused across chunks, and all chunks share one
compiled executable (the last chunk is padded to the chunk shape).
"""
from __future__ import annotations

import functools
import os

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


@functools.lru_cache(maxsize=8)
def _chunk_fn(
    mesh: Mesh, backend: str, segment: int, cap_segment: int,
    lambda_softmax: float, focal_type: str, replicate_out: bool = False,
):
    """One jitted shard_map'ed gallery-chunk computation, shared across
    chunks and eval calls (keyed on the static config; jit's own cache
    handles shapes)."""
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
        # multi-process: replicate the output (one XLA all_gather over the
        # data axis) so every host can fetch the full matrix — a sharded
        # global array's remote rows are not host-addressable
        out_shardings=NamedSharding(
            mesh, P() if replicate_out else P(DATA_AXIS)
        ),
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

    return compute


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
    chunk_rows: int = 0,
    cap_chunk_rows: int = 0,
) -> np.ndarray:
    """Full (n_videos, n_texts) local similarity matrix on the mesh.

    Args (host numpy or jax arrays):
      img_feats (Ni, R, D), lang_feats (Nc, W, D),
      img_mask additive (Ni, R), lang_mask additive (Nc, W)
      chunk_rows: gallery rows per dispatch (0 = DEMOVLP_EVAL_CHUNK, 4096)
      cap_chunk_rows: caption rows per column block (0 =
        DEMOVLP_EVAL_CAP_CHUNK, 8192) — the caption buffer has the same
        >2 GiB transfer hazard as the gallery's
    """
    img_feats = np.asarray(img_feats, dtype=np.float32)
    lang_feats = np.asarray(lang_feats, dtype=np.float32)
    img_mask = np.asarray(img_mask, dtype=np.float32)
    lang_mask = np.asarray(lang_mask, dtype=np.float32)

    n_img = img_feats.shape[0]
    n_cap = lang_feats.shape[0]

    if cap_chunk_rows <= 0:
        cap_chunk_rows = int(os.environ.get("DEMOVLP_EVAL_CAP_CHUNK", 8192))
    if n_cap > cap_chunk_rows:
        # column blocks via recursion; the last block is padded to the chunk
        # shape (inert -100 mask rows) so every block shares one executable
        out = np.empty((n_img, n_cap), dtype=np.float32)
        for cs in range(0, n_cap, cap_chunk_rows):
            ce = min(cs + cap_chunk_rows, n_cap)
            lf = _pad_to(lang_feats[cs:ce], cap_chunk_rows)
            lm = np.full(
                (cap_chunk_rows, lang_mask.shape[1]), -100.0, np.float32
            )
            lm[: ce - cs] = lang_mask[cs:ce]
            out[:, cs:ce] = sharded_local_sims(
                img_feats, lf, img_mask, lm, mesh,
                segment=segment, cap_segment=cap_segment,
                lambda_softmax=lambda_softmax, focal_type=focal_type,
                backend=backend, chunk_rows=chunk_rows,
                cap_chunk_rows=cap_chunk_rows,
            )[:, : ce - cs]
        return out
    from demovlp_tpu.ops.xattn import get_backend

    if backend is None:
        backend = get_backend()
    if backend == "auto":
        # measured on v5e (BENCH_NOTES.md): the fused Pallas kernel is faster
        # AND memory-bounded by construction at gallery scale; CPU (tests)
        # can't run compiled Mosaic, so it keeps the XLA path
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    # caption blocking keeps the per-tile (seg, cap_seg, Lq, Ls) intermediate
    # bounded on the non-fused (XLA) backend for large galleries
    if cap_segment == 0 and backend == "xla" and n_cap > 256:
        cap_segment = 128
    if cap_segment:
        pad_cap = -(-n_cap // cap_segment) * cap_segment - n_cap
        if pad_cap:
            lang_feats = np.pad(lang_feats, ((0, pad_cap), (0, 0), (0, 0)))
            lang_mask = np.pad(
                lang_mask, ((0, pad_cap), (0, 0)), constant_values=-100.0
            )

    if n_img == 0:  # empty/filtered eval split: nothing to chunk or stage
        return np.empty((0, n_cap), dtype=np.float32)
    if chunk_rows <= 0:
        chunk_rows = int(os.environ.get("DEMOVLP_EVAL_CHUNK", 4096))
    chunk = min(n_img, chunk_rows)

    n_dev = mesh.shape[DATA_AXIS]
    # pad the chunk's gallery axis to an equal per-device share only (< n_dev
    # fake rows); the scan segment is then shrunk to the largest divisor of
    # the share, instead of padding the share up to a segment multiple (which
    # wasted up to n_dev*segment-1 rows of eval compute at MSRVTT-1k scale)
    per_dev = -(-chunk // n_dev)
    if backend != "pallas":
        segment = min(segment, per_dev)
        while per_dev % segment:
            segment -= 1
    total = per_dev * n_dev

    fn = _chunk_fn(
        mesh, backend, segment, cap_segment, float(lambda_softmax), focal_type,
        replicate_out=jax.process_count() > 1,
    )

    # captions to device ONCE, reused by every chunk
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(DATA_AXIS))
    lang_dev = jax.device_put(lang_feats, rep)
    lmask_dev = jax.device_put(lang_mask, rep)

    starts = list(range(0, n_img, chunk))

    def _stage(start: int):
        """Pad chunk `start` on host and start its (async) device transfer."""
        stop = min(start + chunk, n_img)
        feats_p = _pad_to(img_feats[start:stop], total)
        # pad masks with -100 (all-padded row) so fake galleries are inert
        mask_p = np.full((total, img_mask.shape[1]), -100.0, dtype=np.float32)
        mask_p[: stop - start] = img_mask[start:stop]
        return jax.device_put(feats_p, shd), jax.device_put(mask_p, shd)

    # double-buffered pipeline: chunk i+1's host padding + H2D transfer
    # overlap chunk i's kernel (device_put and the jit dispatch are async;
    # only the result fetch blocks). Serial transfers cost the 10k-gallery
    # eval 31% throughput vs the 4k point in round 2 (BENCH_NOTES.md); at
    # most two bounded chunk buffers are in flight, so the >2 GiB
    # transfer-crash ceiling stays respected.
    out = np.empty((n_img, n_cap), dtype=np.float32)
    staged = _stage(starts[0])
    for i, start in enumerate(starts):
        feats_dev, mask_dev = staged
        sims = fn(feats_dev, lang_dev, mask_dev, lmask_dev)
        if i + 1 < len(starts):
            staged = _stage(starts[i + 1])
        stop = min(start + chunk, n_img)
        out[start:stop] = np.asarray(sims)[: stop - start, :n_cap]
    return out
