import os

import numpy as np
import pytest

from demovlp_tpu.data.regions import (
    load_frame_regions,
    read_video_regions,
    read_image_regions,
    select_regions,
    FEAT_DIM,
    REGION_DIM,
)
from demovlp_tpu.data.sampling import sample_frame_indices
from demovlp_tpu.data.tokenizer import SimpleTokenizer, build_tokenizer
from demovlp_tpu.data.datasets import dataset_object_loader, DATASET_REGISTRY
from demovlp_tpu.data.loader import RegionDataLoader, collate


def _write_frame_npz(path, n_regions, seed=0, image_w=640, image_h=480):
    rng = np.random.RandomState(seed)
    x = rng.randn(n_regions, FEAT_DIM).astype(np.float32)
    x1 = rng.uniform(0, image_w / 2, n_regions)
    y1 = rng.uniform(0, image_h / 2, n_regions)
    bbox = np.stack(
        [x1, y1, x1 + rng.uniform(1, image_w / 2, n_regions),
         y1 + rng.uniform(1, image_h / 2, n_regions)], axis=1
    ).astype(np.float32)
    info = {
        "objects_conf": rng.uniform(0, 1, n_regions).astype(np.float32),
        "objects_id": rng.randint(0, 1600, n_regions),
        "image_w": image_w,
        "image_h": image_h,
    }
    np.savez(path, x=x, bbox=bbox, info=info)
    return x, bbox, info


def _make_video_dir(tmp_path, name, n_frames, n_regions=10):
    vdir = tmp_path / name
    vdir.mkdir(parents=True, exist_ok=True)
    for i in range(n_frames):
        _write_frame_npz(str(vdir / f"{i}.npz"), n_regions, seed=i)
    return str(vdir)


def test_load_frame_regions_confidence_sort(tmp_path):
    p = str(tmp_path / "0.npz")
    x, bbox, info = _write_frame_npz(p, 8, seed=1)
    fr = load_frame_regions(p)
    conf = info["objects_conf"]
    order = np.argsort(conf)[::-1]
    np.testing.assert_array_equal(fr["feat"], x[order])
    assert (np.diff(fr["conf"]) <= 0).all()
    # geometry: normalized xyxy + wh
    g = fr["geometry"]
    assert g.shape == (8, 6)
    b = bbox[order]
    np.testing.assert_allclose(g[:, 0], b[:, 0] / info["image_w"], rtol=1e-6)
    np.testing.assert_allclose(g[:, 4], (b[:, 2] - b[:, 0]) / info["image_w"], rtol=1e-6)
    np.testing.assert_allclose(g[:, 2], g[:, 0] + g[:, 4], rtol=1e-6)


def test_select_regions_topk_and_pad(tmp_path):
    p = str(tmp_path / "0.npz")
    _write_frame_npz(p, 5, seed=2)
    fr = load_frame_regions(p)
    # K < available: top-k cut
    obj, mask, lens = select_regions([fr], 3)
    assert obj.shape == (1, 3, REGION_DIM) and lens == [3]
    np.testing.assert_array_equal(mask, np.ones((1, 3)))
    # K > available: edge-pad repeats the last valid row, mask marks real count
    obj, mask, lens = select_regions([fr], 8)
    assert lens == [5]
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(obj[0, 5], obj[0, 4])
    np.testing.assert_array_equal(obj[0, 7], obj[0, 4])
    # feature+geometry concat layout
    np.testing.assert_array_equal(obj[0, 0, :FEAT_DIM], fr["feat"][0])
    np.testing.assert_allclose(obj[0, 0, FEAT_DIM:], fr["geometry"][0], rtol=1e-6)


def test_read_video_and_image_regions(tmp_path):
    vdir = _make_video_dir(tmp_path, "vid0", n_frames=6, n_regions=7)
    obj, mask, lens = read_video_regions(vdir, [0, 2, 4], 5)
    assert obj.shape == (3, 5, REGION_DIM)
    obj2, mask2, lens2 = read_image_regions(os.path.join(vdir, "0.npz"), 5)
    assert obj2.shape == (1, 5, REGION_DIM)
    np.testing.assert_array_equal(obj[0], obj2[0])


def test_sample_frame_indices():
    # uniform midpoints
    idxs = sample_frame_indices(4, 16, "uniform")
    assert idxs == [1, 5, 9, 13]
    # rand stays within intervals, sorted
    rng = np.random.default_rng(0)
    for _ in range(10):
        idxs = sample_frame_indices(4, 16, "rand", rng)
        assert len(idxs) == 4 and idxs == sorted(idxs)
        assert all(0 <= i < 16 for i in idxs)
    # fewer frames than segments
    idxs = sample_frame_indices(8, 3, "uniform")
    assert len(idxs) == 3
    # width-1 intervals do not crash (documented deviation)
    idxs = sample_frame_indices(8, 8, "rand", rng)
    assert idxs == list(range(8))


def test_simple_tokenizer_fixed_shapes():
    tok = SimpleTokenizer(max_length=16)
    out = tok(["a dog runs", "hello"])
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    assert out["input_ids"][0, 0] == SimpleTokenizer.CLS_ID
    # deterministic across calls
    out2 = tok(["a dog runs", "hello"])
    np.testing.assert_array_equal(out["input_ids"], out2["input_ids"])
    # truncation
    long = " ".join(["word"] * 100)
    out3 = tok([long])
    assert out3["attention_mask"][0].sum() == 16


def test_build_tokenizer_fallback():
    tok = build_tokenizer("/nonexistent/path")
    out = tok(["test"])
    assert out["input_ids"].shape[1] == 100  # reference max_length


def test_synthetic_dataset_and_loader():
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={"num_frames": 2, "object_num": 4, "num_samples": 32},
        split="train",
    )
    assert len(ds) == 32
    item = ds[0]
    assert item["object"].shape == (2, 4, REGION_DIM)
    assert isinstance(item["text"], str)

    loader = RegionDataLoader(
        ds, batch_size=8, shuffle=True, num_workers=2,
        process_index=0, process_count=1,
    )
    batches = list(loader)
    assert len(batches) == 4 == len(loader)
    b = batches[0]
    assert b["object"].shape == (8, 2, 4, REGION_DIM)
    assert len(b["text"]) == 8


def test_loader_host_sharding_partitions_indices():
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={"num_frames": 1, "object_num": 2, "num_samples": 40},
        split="test",
    )
    seen = []
    for rank in range(4):
        loader = RegionDataLoader(
            ds, batch_size=5, shuffle=False, num_workers=1,
            process_index=rank, process_count=4,
        )
        idx, valid = loader._host_indices()
        assert len(idx) == 10
        assert valid is None  # 40 divides evenly over 4 hosts: no padding
        seen.append(idx)
    allidx = np.concatenate(seen)
    assert len(np.unique(allidx)) == 40  # disjoint cover


def test_loader_epoch_reshuffle():
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={"num_frames": 1, "object_num": 2, "num_samples": 64},
        split="train",
    )
    loader = RegionDataLoader(
        ds, batch_size=8, shuffle=True, num_workers=1,
        process_index=0, process_count=1,
    )
    loader.set_epoch(0)
    a, _ = loader._host_indices()
    loader.set_epoch(1)
    b, _ = loader._host_indices()
    assert not np.array_equal(a, b)
    loader.set_epoch(0)
    np.testing.assert_array_equal(a, loader._host_indices()[0])


def test_bad_sample_resample(tmp_path):
    """Unreadable videos are swapped for other samples (reference
    MSRVTT_dataset.py:129-157) — bounded, counted."""
    from demovlp_tpu.data.datasets.base import RegionDataset

    good = _make_video_dir(tmp_path, "good", n_frames=4, n_regions=6)

    class TwoVideos(RegionDataset):
        def _load_metadata(self):
            self.metadata = ["missing", "good"]

        def _object_path(self, index):
            return str(tmp_path / self.metadata[index])

        def _text(self, index, rng):
            return f"caption {self.metadata[index]}"

    ds = TwoVideos(
        dataset_name="TwoVideos",
        object_params={"num_frames": 2, "object_num": 4},
        split="test",
    )
    item = ds.get_item(0, np.random.default_rng(0))
    assert item["text"] == "caption good"
    assert ds.resample_count >= 1


def test_collate_with_labels():
    items = [
        {"object": np.zeros((1, 2, REGION_DIM), np.float32),
         "object_mask": np.ones((1, 2), np.float32),
         "object_len": [2], "text": "t", "meta": {}, "label": 3,
         "question_id": 7},
    ]
    b = collate(items)
    assert b["label"].dtype == np.int32 and b["label"][0] == 3
    assert b["question_id"][0] == 7


def test_registry_has_all_reference_datasets():
    expected = {
        "MSRVTTObjectSelect", "MSRVTTQAObjectSelect", "MSRVTTMCObjectSelect",
        "WebVidObjectSelect", "ConceptualCaptions3MObjectSelect",
        "MSVDObjectSelect", "MSVDQAObjectSelect", "DiDeMoObjectSelect",
        "LSMDCObjectSelect", "LSMDCMCObjectSelect", "TGIFFrameObjectSelect",
    }
    assert expected <= set(DATASET_REGISTRY)


def test_read_object_topk_legacy(tmp_path):
    from demovlp_tpu.data.regions import read_object_topk

    vdir = _make_video_dir(tmp_path, "legacy", n_frames=2, n_regions=5)
    out = read_object_topk(str(vdir), [0, 1], top_k=8)
    assert out.shape == (2, 8, REGION_DIM)
    # padded rows repeat the last region (edge pad), frames readable
    np.testing.assert_array_equal(out[0, 5], out[0, 4])
    # missing frame -> all-ones block (reference fallback)
    out2 = read_object_topk(str(vdir), [0, 99], top_k=4)
    np.testing.assert_array_equal(out2[1], np.ones((4, REGION_DIM), np.float32))
    # unique-classes mode keeps one region per detector class
    out3 = read_object_topk(str(vdir), [0], top_k=4, unique_classes=True)
    assert out3.shape == (1, 4, REGION_DIM)


def test_mc_meta_raw_caption_is_canonical_string():
    """ADVICE round-4 item 3: MC datasets return the options LIST from
    _text, but meta['raw_captions'] must keep the reference's
    raw-caption-STRING convention (base_dataset.py:130) so the serving
    index never stores a Python-repr'd list — the canonical caption is the
    first (ground-truth-ordered) option."""
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": 1, "object_num": 4, "num_samples": 8,
            "task": "mc", "num_options": 5,
        },
        split="test",
    )
    sample = ds[0]
    opts = sample["text"]
    assert isinstance(opts, (list, tuple)) and len(opts) == 5
    raw = sample["meta"]["raw_captions"]
    assert isinstance(raw, str) and raw == opts[0]
