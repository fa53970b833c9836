"""Offline embedding extraction + retrieval index: the serving surface.

The reference has NO serving layer (SURVEY.md §1: "There is no serving
layer ... the whole framework = config-driven trainer") — using a trained
DemoVLP model for retrieval means running a trainer validation epoch
(trainer/trainer_dist.py:205-408). This module is net-new capability: a
standalone, jit-compiled, mesh-sharded embedding extractor plus the
combined global+local similarity index, so a trained checkpoint (orbax, or
a reference .pth via the converter) serves retrieval queries without a
training loop. `scripts/extract_embeddings.py` is the CLI.

Semantics are pinned to the trainer eval path (train/retrieval.py
_valid_epoch): identical embedding dict, identical wrap-pad/validity
handling at any process count, and the combined matrix keeps the
reference's orientation quirk — global_sims(text, video) +
local_sims(video, text) summed elementwise (trainer/trainer_dist.py:
369-385) — plus the MSCOCO every-5th-row gallery dedup (:365-368).
tests/test_serve.py asserts the extractor matches the trainer's gathered
arrays exactly.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from demovlp_tpu.ops.masking import additive_mask
from demovlp_tpu.ops.similarity import sim_matrix
from demovlp_tpu.parallel.mesh import (DATA_AXIS, batch_sharding,
                                        fetch_local_rows,
                                        host_allgather_pylist,
                                        host_allgather_ragged,
                                        replicated_sharding, shard_batch)
from demovlp_tpu.parallel.sharded_eval import sharded_local_sims
from demovlp_tpu.train.steps import pad_batch, prepare_batch

#: keys of the gathered embedding dict, in trainer order
EMBED_KEYS = ("g_t", "g_o", "l_t", "l_o", "o_mask", "t_mask", "t_len")


def make_embed_step(model, mesh) -> Callable:
    """Forward-only jitted embedding step (the eval step minus the loss).
    Params in_sharding None inherits the committed layout, so TP-committed
    params work unchanged (see train/steps.py make_retrieval_eval_step)."""

    def step(params, batch):
        out = model.apply(params, batch, deterministic=True)
        out = dict(out)
        out.pop("mlm_logits", None)  # not scored here; let XLA DCE it
        out["text_mask_add"] = additive_mask(batch["attention_mask"][:, 1:])
        out["text_length"] = jnp.sum(batch["attention_mask"], axis=1)
        return out

    dat = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, dat), out_shardings=dat)


def embed_loader(
    embed_step: Callable,
    params,
    dl,
    tokenizer,
    mesh,
    transfer_dtype=None,
) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Embed every sample of a (possibly multi-host-sharded) loader once.

    Returns (cat, metas): `cat` maps EMBED_KEYS to full-split arrays in
    dataset order — globally gathered across hosts with the same ragged
    merge as the trainer, pad/duplicate rows dropped; `metas` carries the
    gathered 'paths'/'raw_captions' strings, row-aligned with `cat`.

    The loop keeps one batch in flight: batch i+1 is assembled and its
    transfer+compute dispatched before batch i's outputs are fetched, so
    host assembly and H2D overlap device work (on tunneled single-host
    setups the H2D of the 98 MB region tensor is the dominant per-batch
    cost — measured 6 s vs 0.07 s compute at b=50/f=8).

    `transfer_dtype` (e.g. jnp.bfloat16) casts the region-feature tensor
    on the host before transfer, halving H2D bytes. For a bf16-compute
    model this is bit-identical: the tower's first op is
    `x.astype(self.dtype)` (models/object_transformer.py), and numpy's
    round-to-nearest-even f32->bf16 matches XLA's convert
    (tests/test_serve.py pins equality).
    """
    arrs: Dict[str, List[np.ndarray]] = {k: [] for k in EMBED_KEYS}
    paths: List[str] = []
    captions: List[str] = []

    def drain(out, keep) -> None:
        # outputs are 'data'-sharded over the GLOBAL mesh: keep this host's
        # own rows; the ragged gather below reassembles dataset order
        arrs["g_t"].append(fetch_local_rows(out["global_text_embeddings"])[keep])
        arrs["g_o"].append(
            fetch_local_rows(out["global_object_embeddings"])[keep]
        )
        arrs["l_t"].append(fetch_local_rows(out["local_text_embeddings"])[keep])
        arrs["l_o"].append(
            fetch_local_rows(out["local_object_embeddings"])[keep]
        )
        arrs["o_mask"].append(fetch_local_rows(out["object_mask"])[keep])
        arrs["t_mask"].append(fetch_local_rows(out["text_mask_add"])[keep])
        arrs["t_len"].append(fetch_local_rows(out["text_length"])[keep])

    pending = None
    for data in dl:
        arrays = prepare_batch(data, tokenizer)
        arrays.pop("label", None)
        sample_valid = arrays.pop("sample_valid", None)
        arrays, n_valid = pad_batch(arrays, dl.batch_size)
        valid = (np.arange(dl.batch_size) < n_valid).astype(np.float32)
        if sample_valid is not None:
            valid[:n_valid] *= sample_valid
        keep = valid.astype(bool)
        metas = data.get("meta", [{}] * n_valid)
        for m, k in zip(metas, keep[: len(metas)]):
            if k:
                paths.append(str(m.get("paths", "")))
                captions.append(str(m.get("raw_captions", "")))
        if transfer_dtype is not None:
            arrays["object"] = arrays["object"].astype(transfer_dtype)
        out = embed_step(params, shard_batch(arrays, mesh))
        if pending is not None:
            drain(*pending)
        pending = (out, keep)
    if pending is not None:
        drain(*pending)
    cat = {k: np.concatenate(v, axis=0) for k, v in arrs.items()}
    cat = {k: host_allgather_ragged(v) for k, v in cat.items()}
    meta = {
        "paths": host_allgather_pylist(paths),
        "raw_captions": host_allgather_pylist(captions),
    }
    return cat, meta


def make_text_embed_step(model, mesh) -> Callable:
    """Text-tower-only jitted forward for ad-hoc retrieval queries: the
    embedding step minus the object tower (reference model.py compute_text
    — the reference can only run it inside a full forward). Same params
    contract as make_embed_step: in_sharding None inherits the committed
    layout, so TP-committed params work unchanged."""

    def step(params, input_ids, attention_mask):
        g_t, l_t = model.apply(
            params, input_ids, attention_mask, True, method="compute_text"
        )
        return {
            "g_t": g_t,
            "l_t": l_t,
            "t_mask": additive_mask(attention_mask[:, 1:]),
        }

    dat = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(None, dat, dat), out_shardings=dat)


def embed_texts(
    text_step: Callable,
    params,
    queries,
    tokenizer,
    mesh,
    *,
    batch_size: int = 128,
    max_text_len: int = 100,
) -> Dict[str, np.ndarray]:
    """Embed ad-hoc query strings through the text tower only.

    Every process passes the SAME `queries` list; rows are split
    contiguously across processes (the shard_batch process-order contract,
    parallel/mesh.py) and reassembled in order with the same ragged gather
    as embed_loader, so every host gets exactly len(queries) result rows.
    All hosts run the same number of identically-shaped dispatches (pad
    rows fill ragged tails), keeping collective steps aligned.

    Returns {'g_t' (N,D), 'l_t' (N,L-1,D), 't_mask' additive (N,L-1)}.
    """
    if not queries:
        raise ValueError("embed_texts: empty query list")
    queries = [str(q) for q in queries]
    nproc = jax.process_count()
    per = -(-len(queries) // nproc)  # rows per host, last host may be short
    lo = per * jax.process_index()
    local = queries[lo:lo + per]
    # the chunk's GLOBAL batch (nproc * bs) must divide over the mesh's
    # 'data' axis: round the per-host chunk up to a data-axis multiple
    ndata = dict(mesh.shape).get(DATA_AXIS, 1)
    bs = max(1, min(batch_size, per))
    bs = -(-bs // ndata) * ndata
    outs: Dict[str, List[np.ndarray]] = {k: [] for k in ("g_t", "l_t", "t_mask")}
    pending = None

    def drain(out, keep) -> None:
        for k in outs:
            outs[k].append(fetch_local_rows(out[k])[keep])

    # one batch in flight, as in embed_loader
    for s in range(0, per, bs):
        chunk = local[s:s + bs]
        keep = np.arange(bs) < len(chunk)
        chunk = chunk + [""] * (bs - len(chunk))
        enc = tokenizer(chunk, max_length=max_text_len)
        sharded = shard_batch(
            {"input_ids": enc["input_ids"],
             "attention_mask": enc["attention_mask"]},
            mesh,
        )
        out = text_step(params, sharded["input_ids"],
                        sharded["attention_mask"])
        if pending is not None:
            drain(*pending)
        pending = (out, keep)
    if pending is not None:
        drain(*pending)
    cat = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
    if nproc > 1:
        cat = {k: host_allgather_ragged(v) for k, v in cat.items()}
    return cat


def load_index(path) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Read back the npz scripts/extract_embeddings.py writes: (cat, meta)
    exactly as embed_loader returned them (missing keys tolerated, so a
    gallery-only npz works for querying)."""
    z = np.load(path, allow_pickle=False)
    cat = {k: z[k] for k in EMBED_KEYS if k in z.files}
    meta = {
        k: [str(s) for s in z[k]]
        for k in ("paths", "raw_captions")
        if k in z.files
    }
    return cat, meta


def query_retrieval(
    text_step: Callable,
    params,
    queries,
    tokenizer,
    gallery: Dict[str, np.ndarray],
    mesh,
    *,
    k: int = 10,
    use_local: bool = True,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
    segment: int = 64,
    backend: str = "auto",
    mscoco_dedup: bool = False,
    gallery_meta: Dict[str, List[str]] | None = None,
    batch_size: int = 128,
) -> List[Dict[str, Any]]:
    """Free-text -> top-k gallery videos against a prebuilt index.

    `gallery` is the dict embed_loader returns (or load_index reads back);
    only the video-side keys (g_o, l_o, o_mask) are consulted. Scoring:
    global cosine + (if use_local) the mesh-sharded local cross-attention
    sims. The query/gallery matrix is non-square, where the reference's
    elementwise quirk sum (trainer_dist.py:369-385 pairs local(video_i,
    text_j) with global(text_i, video_j)) is undefined — the transpose
    convention from the MSCOCO-dedup case applies (PARITY.md #16): local
    is computed (gallery video, query text) and transposed onto the
    (query, gallery) global sims. Under mscoco_dedup the gallery is
    deduped to every 5th row before scoring and topk_indices are mapped
    back to undeduped npz-row coordinates (as in the extraction CLI)."""
    q = embed_texts(
        text_step, params, queries, tokenizer, mesh, batch_size=batch_size
    )
    gal = gallery
    if mscoco_dedup:
        gal = {key: v[::5] for key, v in gallery.items()}
        if gallery_meta is not None:
            gallery_meta = {key: v[::5] for key, v in gallery_meta.items()}
    sims = np.asarray(
        sim_matrix(q["g_t"].astype(np.float32),
                   gal["g_o"].astype(np.float32))
    )
    if use_local:
        local = sharded_local_sims(
            gal["l_o"],
            q["l_t"],
            gal["o_mask"],
            q["t_mask"],
            mesh,
            segment=segment,
            lambda_softmax=lambda_softmax,
            focal_type=focal_type,
            backend=backend,
        )
        sims = sims + np.asarray(local).T  # (query, gallery)
    results = topk_retrieval(
        sims, k=k,
        query_meta={"raw_captions": [str(s) for s in queries]},
        gallery_meta=gallery_meta,
    )
    if mscoco_dedup:
        for r in results:
            r["topk_indices"] = [5 * i for i in r["topk_indices"]]
    return results


def combined_sims(
    cat: Dict[str, np.ndarray],
    mesh,
    *,
    use_local: bool = True,
    lambda_softmax: float = 20.0,
    focal_type: str = "prob",
    segment: int = 64,
    backend: str = "auto",
    mscoco_dedup: bool = False,
) -> np.ndarray:
    """(text, video) similarity matrix exactly as the trainer scores eval:
    global cosine sims + (if use_local) the mesh-sharded local
    cross-attention sims, summed with the reference's orientation quirk."""
    if mscoco_dedup:
        cat = dict(cat)
        for key in ("g_o", "l_o", "o_mask"):
            cat[key] = cat[key][::5]
    sims = np.asarray(sim_matrix(cat["g_t"], cat["g_o"]))
    if use_local:
        local = sharded_local_sims(
            cat["l_o"],
            cat["l_t"],
            cat["o_mask"],
            cat["t_mask"],
            mesh,
            segment=segment,
            lambda_softmax=lambda_softmax,
            focal_type=focal_type,
            backend=backend,
        )
        # (video,text) — under MSCOCO dedup the matrix is non-square and the
        # reference's quirk sum is undefined (it would raise at
        # trainer_dist.py:385); transpose to (text,video) then. PARITY.md #16
        if local.shape != sims.shape:
            local = local.T
        sims = sims + local
    return sims


def predict_qa(
    eval_step: Callable,
    params,
    dl,
    tokenizer,
    mesh,
    label2ans=None,
    transfer_dtype=None,
) -> List[Dict[str, Any]]:
    """Offline video-QA prediction over a (possibly multi-host-sharded)
    loader: one entry {question_id, answer (label index), answer_text} per
    sample, every sample exactly once. Mirrors the QA trainer's eval
    assembly (train/qa.py _valid_epoch, reference trainer/trainer_dist.py:
    619-655) minus the metric scoring — the output feeds evaluate_qa or an
    application directly. `eval_step` comes from
    train.steps.make_qa_eval_step. One batch is kept in flight and
    `transfer_dtype` pre-casts the region tensor, exactly as in
    embed_loader (same H2D-dominance rationale)."""
    preds_l: List[np.ndarray] = []
    qids_l: List[np.ndarray] = []
    pending = None

    def drain(logits_dev, keep, qids) -> None:
        logits = fetch_local_rows(logits_dev)[keep]
        preds_l.append(logits.argmax(axis=-1))
        qids_l.append(qids)

    for data in dl:
        arrays = prepare_batch(data, tokenizer)
        arrays.pop("label", None)
        sample_valid = arrays.pop("sample_valid", None)
        arrays, n_valid = pad_batch(arrays, dl.batch_size)
        keep = np.arange(dl.batch_size) < n_valid
        if sample_valid is not None:
            keep[:n_valid] &= sample_valid.astype(bool)
        if transfer_dtype is not None:
            arrays["object"] = arrays["object"].astype(transfer_dtype)
        logits_dev = eval_step(params, shard_batch(arrays, mesh))
        qids = np.asarray(data["question_id"])[keep[: len(data["question_id"])]]
        if pending is not None:
            drain(*pending)
        pending = (logits_dev, keep, qids)
    if pending is not None:
        drain(*pending)
    preds = (np.concatenate(preds_l) if preds_l
             else np.zeros((0,), np.int64))
    qids = np.concatenate(qids_l) if qids_l else np.zeros((0,), np.int64)
    # gather ONCE after the loop (like embed_loader): host shards are
    # contiguous in dataset order, so one ragged concat of whole shards
    # preserves dataset order — a per-batch gather would interleave
    if jax.process_count() > 1:
        preds = host_allgather_ragged(preds)
        qids = host_allgather_ragged(qids)
    results: List[Dict[str, Any]] = []
    for qid, pred in zip(qids, preds):
        entry: Dict[str, Any] = {"question_id": int(qid), "answer": int(pred)}
        if label2ans is not None:
            entry["answer_text"] = label2ans[int(pred)]
        results.append(entry)
    return results


def topk_retrieval(
    sims: np.ndarray,
    k: int = 10,
    query_meta: Dict[str, List[str]] | None = None,
    gallery_meta: Dict[str, List[str]] | None = None,
) -> List[Dict[str, Any]]:
    """Per-query top-k gallery indices/scores from a (query, gallery)
    similarity matrix, with optional human-readable metadata attached."""
    k = min(k, sims.shape[1])
    order = np.argsort(-sims, axis=1)[:, :k]
    results = []
    for q, idxs in enumerate(order):
        entry: Dict[str, Any] = {
            "query_index": q,
            "topk_indices": idxs.tolist(),
            "topk_scores": sims[q, idxs].astype(float).tolist(),
        }
        if query_meta is not None:
            entry["query_caption"] = query_meta["raw_captions"][q]
        if gallery_meta is not None:
            entry["topk_paths"] = [gallery_meta["paths"][i] for i in idxs]
        results.append(entry)
    return results
