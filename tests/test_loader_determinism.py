"""Input-pipeline determinism under threading: the prefetching loader must
yield identical batches for identical (seed, epoch) regardless of worker
count — the race-safety contract of the threaded producer."""
import numpy as np

from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.loader import RegionDataLoader


def _ds(n=40):
    return dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={"num_frames": 2, "object_num": 4, "num_samples": n},
        split="train",
    )


def _collect(loader, epoch):
    loader.set_epoch(epoch)
    return list(loader)


def test_same_epoch_same_batches_across_worker_counts():
    ds = _ds()
    a = _collect(
        RegionDataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                         process_index=0, process_count=1, seed=7), 3)
    b = _collect(
        RegionDataLoader(ds, batch_size=8, shuffle=True, num_workers=4,
                         process_index=0, process_count=1, seed=7), 3)
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["object"], bb["object"])
        np.testing.assert_array_equal(ba["object_mask"], bb["object_mask"])
        assert ba["text"] == bb["text"]


def test_different_seed_different_stream():
    ds = _ds()
    a = _collect(
        RegionDataLoader(ds, batch_size=8, shuffle=True, num_workers=2,
                         process_index=0, process_count=1, seed=1), 0)
    b = _collect(
        RegionDataLoader(ds, batch_size=8, shuffle=True, num_workers=2,
                         process_index=0, process_count=1, seed=2), 0)
    assert any(
        not np.array_equal(ba["object"], bb["object"]) for ba, bb in zip(a, b)
    )
