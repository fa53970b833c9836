"""Multi-host MC prediction merge (replaces the reference's per-rank JSON
file merge, trainer/trainer_dist.py:831-849). Two simulated hosts with
strided loader shards must reconstruct the full {mc_id: pred} map."""
import numpy as np

from demovlp_tpu.train.mc import merge_mc_predictions


def _simulated_two_host_gather(host0, host1, ids):
    """Run merge for host0 with an allgather faked to append host1's
    corresponding arrays, following the merge protocol: counts first, then
    (-1)-padded idx and pred arrays (hosts may hold unequal counts)."""
    id2idx = {m: i for i, m in enumerate(ids)}
    idx1 = np.asarray([id2idx[k] for k in host1], np.int64)
    pred1 = np.asarray(list(host1.values()), np.int64)
    cap = max(len(host0), len(host1))

    def pad(a):
        return np.concatenate([a, np.full(cap - a.size, -1, np.int64)])

    other = [np.asarray([idx1.size], np.int64), pad(idx1), pad(pred1)]
    calls = {"n": 0}

    def fake_allgather(x):
        o = other[calls["n"]]
        calls["n"] += 1
        return np.concatenate([np.asarray(x), o])

    return merge_mc_predictions(host0, ids, allgather=fake_allgather)


def test_merge_two_hosts_reconstructs_full_map():
    ids = [f"mc{i}" for i in range(10)]
    truth = {ids[i]: i % 5 for i in range(10)}
    # strided shards, like RegionDataLoader._host_indices
    host0 = {ids[i]: truth[ids[i]] for i in range(0, 10, 2)}
    host1 = {ids[i]: truth[ids[i]] for i in range(1, 10, 2)}
    merged = _simulated_two_host_gather(host0, host1, ids)
    assert merged == truth


def test_merge_single_host_is_identity():
    ids = ["a", "b", "c"]
    preds = {"a": 1, "c": 4}
    merged = merge_mc_predictions(preds, ids, allgather=lambda x: np.asarray(x))
    assert merged == preds


def test_merge_unequal_host_counts():
    """A host whose shard collapsed entries (corrupt-sample resample onto an
    mc_id already present) holds fewer predictions; the counts-gather + -1
    padding keeps process_allgather shapes equal and the merge exact."""
    ids = [f"mc{i}" for i in range(9)]
    host0 = {ids[i]: i % 5 for i in (0, 2, 4, 6, 8)}
    host1 = {ids[i]: i % 5 for i in (1, 3, 5)}  # one entry collapsed away
    merged = _simulated_two_host_gather(host0, host1, ids)
    assert merged == {**host0, **host1}
