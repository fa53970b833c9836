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


def test_early_break_reaps_producer_thread():
    """Abandoning the iterator early (the max_samples_per_epoch break in
    train/retrieval.py) must terminate the producer thread + its pool
    instead of leaking one blocked thread per epoch."""
    import threading

    ds = _ds(n=64)
    loader = RegionDataLoader(
        ds, batch_size=4, shuffle=True, num_workers=2,
        process_index=0, process_count=1, seed=0, prefetch=1,
    )
    baseline = threading.active_count()
    for epoch in range(50):
        loader.set_epoch(epoch)
        it = iter(loader)
        next(it)  # consume one batch, abandon the rest
        it.close()  # what the GC / for-loop break does
    # producers must all have exited; allow transient slack of 1
    assert threading.active_count() <= baseline + 1, threading.active_count()


def test_producer_exception_propagates_to_consumer():
    """A raising dataset must surface its exception at the consumer promptly
    instead of hanging the iterator forever."""
    import pytest

    class Boom:
        dataset_name = "boom"

        def __len__(self):
            return 16

        def get_item(self, idx, rng):
            raise RuntimeError("corrupt shard")

    loader = RegionDataLoader(
        Boom(), batch_size=4, shuffle=False, num_workers=2,
        process_index=0, process_count=1, seed=0,
    )
    with pytest.raises(RuntimeError, match="corrupt shard"):
        list(loader)
