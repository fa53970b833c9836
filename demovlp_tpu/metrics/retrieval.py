"""Retrieval metrics on similarity matrices (host-side numpy).

Behavior spec: reference model/metric.py. Semantics preserved:
  * t2v: distances ranked per text query; ties broken OPTIMISTICALLY
    (metric.py:58-66) with an "averaging" mode available (the reference's
    dead debug branch at :67-91 is our test oracle).
  * Multi-caption ground truth: with num_queries = k * num_vids, text query
    i's ground-truth video is i // k (metric.py:29-35).
  * v2t: for each video, rank of the *closest* of its captions, ties broken
    by AVERAGING (metric.py:152-189).
  * query_masks mark missing captions (e.g. two MSRVTT videos have only 19
    of 20).
"""
from __future__ import annotations

import numpy as np
import scipy.stats


def t2v_metrics(sims, query_masks=None, break_ties: str = "optimistically"):
    """Text-to-video retrieval metrics.

    Args:
      sims: (num_queries, num_vids) similarity matrix, num_queries a
        multiple of num_vids; query i's ground truth is video i // k.
      query_masks: optional (num_vids, k) or flat (num_queries,) binary mask
        of valid queries.
    """
    sims = np.asarray(sims)
    assert sims.ndim == 2, "expected a matrix"
    num_queries, num_vids = sims.shape
    dists = -sims
    sorted_dists = np.sort(dists, axis=1)

    queries_per_video = num_queries // num_vids
    # ground-truth distance for each query row
    gt_idx = np.concatenate(
        [
            np.full(queries_per_video, jj, dtype=np.int64)
            for jj in range(num_vids)
        ]
    )
    gt_dists = dists[np.arange(num_queries), gt_idx][:, np.newaxis]

    rows, cols = np.where((sorted_dists - gt_dists) == 0)

    if rows.size > num_queries:
        assert np.unique(rows).size == num_queries, "issue in metric evaluation"
        if break_ties == "optimistically":
            _, idx = np.unique(rows, return_index=True)
            cols = cols[idx]
        elif break_ties == "averaging":
            locs = np.argwhere((sorted_dists - gt_dists) == 0)
            steps = np.diff(locs[:, 0])
            splits = np.nonzero(steps)[0] + 1
            splits = np.insert(splits, 0, 0)
            summed_cols = np.add.reduceat(locs[:, 1], splits)
            counts = np.diff(np.append(splits, locs.shape[0]))
            cols = summed_cols / counts
        else:
            raise ValueError(break_ties)

    msg = f"expected ranks to match queries ({cols.size} vs {num_queries})"
    assert cols.size == num_queries, msg

    if query_masks is not None:
        assert query_masks.size == num_queries, "invalid query mask shape"
        cols = cols[np.asarray(query_masks).reshape(-1).astype(bool)]
        assert cols.size == query_masks.sum(), "masking was not applied correctly"
        num_queries = int(query_masks.sum())

    return cols2metrics(cols, num_queries)


def v2t_metrics(sims, query_masks=None, break_ties: str = "averaging"):
    """Video-to-text retrieval metrics: rank of the closest GT caption.

    Args:
      sims: (num_queries_text, num_vids) — the SAME orientation as
        t2v_metrics; transposed internally (reference metric.py:141).
    """
    sims = np.asarray(sims).T
    assert sims.ndim == 2, "expected a matrix"
    num_queries, num_caps = sims.shape
    dists = -sims.copy()
    caps_per_video = num_caps // num_queries

    MISSING_VAL = 1e8
    if query_masks is not None:
        invalid = np.logical_not(np.asarray(query_masks).reshape(-1).astype(bool))
    query_ranks = []
    for ii in range(num_queries):
        row_dists = dists[ii, :]
        if query_masks is not None:
            row_dists[invalid] = MISSING_VAL
        sorted_dists = np.sort(row_dists)
        min_rank = np.inf
        for jj in range(ii * caps_per_video, (ii + 1) * caps_per_video):
            if row_dists[jj] == MISSING_VAL:
                continue
            ranks = np.where((sorted_dists - row_dists[jj]) == 0)[0]
            if break_ties == "optimistically":
                rank = ranks[0]
            elif break_ties == "averaging":
                rank = ranks.mean()
            else:
                raise ValueError(break_ties)
            if rank < min_rank:
                min_rank = rank
        query_ranks.append(min_rank)
    query_ranks = np.array(query_ranks)

    return cols2metrics(query_ranks, num_queries)


def cols2metrics(cols, num_queries):
    """Rank vector -> R@K / MedR / MeanR / geometric mean
    (reference model/metric.py:298-308)."""
    cols = np.asarray(cols)
    metrics = {}
    metrics["R1"] = 100 * float(np.sum(cols == 0)) / num_queries
    metrics["R5"] = 100 * float(np.sum(cols < 5)) / num_queries
    metrics["R10"] = 100 * float(np.sum(cols < 10)) / num_queries
    metrics["R50"] = 100 * float(np.sum(cols < 50)) / num_queries
    metrics["MedR"] = float(np.median(cols) + 1)
    metrics["MeanR"] = float(np.mean(cols) + 1)
    stats = [metrics[x] for x in ("R1", "R5", "R10")]
    metrics["geometric_mean_R1-R5-R10"] = float(scipy.stats.mstats.gmean(stats))
    return metrics
