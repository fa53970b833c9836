"""Whole-batch native assembly (one C++ threaded call per batch,
data/loader.py _fetch_batch_native) must be bit-identical to the per-sample
pool.map + collate path, including resample behavior on corrupt files."""
import os

import numpy as np
import pytest

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.loader import RegionDataLoader
from demovlp_tpu.data.native import get_native_reader

from .test_native import _make_video

needs_native = pytest.mark.skipif(
    get_native_reader() is None, reason="native reader unavailable"
)


class _TreeDataset(RegionDataset):
    """Minimal video dataset over an on-disk npz tree (uses the BASE
    _load_objects, so the loader's native batch path engages)."""

    def _load_metadata(self):
        root = self.data_dir
        self.metadata = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )

    def _object_path(self, index):
        return os.path.join(self.data_dir, self.metadata[index])

    def _text(self, index, rng):
        return f"caption for {self.metadata[index]}"


def _make_tree(tmp_path, n_videos=6, frames=3):
    for v in range(n_videos):
        vdir = tmp_path / f"v{v:02d}"
        vdir.mkdir()
        sub = _make_video(vdir, n_frames=frames, seed=v)
        # _make_video writes into vdir/"vid"; flatten to vdir
        for f in os.listdir(sub):
            os.replace(os.path.join(sub, f), str(vdir / f))
        os.rmdir(sub)
    return str(tmp_path)


def _collect(loader):
    return [b for b in loader]


def _loader(root, **kw):
    ds = _TreeDataset(
        "tree",
        object_params={"num_frames": 2, "object_num": 5},
        data_dir=root,
        split="train",
    )
    return RegionDataLoader(
        ds, batch_size=3, shuffle=True, num_workers=2, drop_last=True,
        process_index=0, process_count=1, **kw
    )


@needs_native
def test_batched_assembly_matches_per_sample(tmp_path, monkeypatch):
    root = _make_tree(tmp_path)
    monkeypatch.setenv("DEMOVLP_NATIVE_BATCH", "1")
    batched = _collect(_loader(root))
    monkeypatch.setenv("DEMOVLP_NATIVE_BATCH", "0")
    per_sample = _collect(_loader(root))
    assert len(batched) == len(per_sample) == 2
    for a, b in zip(batched, per_sample):
        np.testing.assert_array_equal(a["object"], b["object"])
        np.testing.assert_array_equal(a["object_mask"], b["object_mask"])
        assert a["text"] == b["text"]
        assert [m["paths"] for m in a["meta"]] == [m["paths"] for m in b["meta"]]


@needs_native
def test_batched_assembly_corrupt_file_falls_back(tmp_path, monkeypatch):
    root = _make_tree(tmp_path)
    # corrupt every frame of one video: planning still passes (files exist)
    # but decode fails -> the batched path must fall back per-row and
    # resample exactly like the per-sample path
    for f in os.listdir(os.path.join(root, "v01")):
        with open(os.path.join(root, "v01", f), "wb") as fh:
            fh.write(b"not a zip file")
    monkeypatch.setenv("DEMOVLP_NATIVE_BATCH", "1")
    batched = _collect(_loader(root))
    monkeypatch.setenv("DEMOVLP_NATIVE_BATCH", "0")
    per_sample = _collect(_loader(root))
    for a, b in zip(batched, per_sample):
        np.testing.assert_array_equal(a["object"], b["object"])
        np.testing.assert_array_equal(a["object_mask"], b["object_mask"])
        assert a["text"] == b["text"]


def test_loader_disables_batch_path_for_overriding_datasets(tmp_path):
    """Datasets with custom _load_objects (images/synthetic) must keep the
    per-sample path."""
    from demovlp_tpu.data.datasets import dataset_object_loader

    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={"num_frames": 2, "object_num": 4, "num_samples": 8},
        split="train",
    )
    loader = RegionDataLoader(
        ds, batch_size=4, shuffle=False, num_workers=1, drop_last=True,
        process_index=0, process_count=1,
    )
    assert loader._native_batch_reader() is None


@needs_native
def test_short_video_pads_frames_and_matches(tmp_path, monkeypatch):
    """A video with fewer files than num_frames repeats its last frame
    (base._frame_indices) — fixed shapes in BOTH loader paths, equal
    batches. Regression for the native-batch OOB-write hazard."""
    root = _make_tree(tmp_path, n_videos=6, frames=3)
    # v02 gets only 2 frames: below num_frames=2? use num_frames=3 loaders
    for f in ("2.npz",):
        os.remove(os.path.join(root, "v02", f))

    def loader():
        ds = _TreeDataset(
            "tree",
            object_params={"num_frames": 3, "object_num": 5},
            data_dir=root,
            split="train",
        )
        return RegionDataLoader(
            ds, batch_size=3, shuffle=True, num_workers=2, drop_last=True,
            process_index=0, process_count=1,
        )

    monkeypatch.setenv("DEMOVLP_NATIVE_BATCH", "1")
    batched = _collect(loader())
    monkeypatch.setenv("DEMOVLP_NATIVE_BATCH", "0")
    per_sample = _collect(loader())
    for a, b in zip(batched, per_sample):
        assert a["object"].shape[1] == 3  # always num_frames frames
        np.testing.assert_array_equal(a["object"], b["object"])
        np.testing.assert_array_equal(a["object_mask"], b["object_mask"])
