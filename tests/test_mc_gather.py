"""Multi-host MC prediction merge (replaces the reference's per-rank JSON
file merge, trainer/trainer_dist.py:831-849). Two simulated hosts with
strided loader shards must reconstruct the full {mc_id: pred} map."""
import numpy as np

from demovlp_tpu.train.mc import merge_mc_predictions


def _simulated_two_host_gather(host0, host1, ids):
    """Run merge for host0 with an allgather faked to append host1's
    corresponding arrays (same call order: idx then pred)."""
    id2idx = {m: i for i, m in enumerate(ids)}
    other = [
        np.asarray([id2idx[k] for k in host1], np.int64),
        np.asarray(list(host1.values()), np.int64),
    ]
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
