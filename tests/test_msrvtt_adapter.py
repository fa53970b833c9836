"""MSRVTT adapter against a synthetic on-disk metadata tree (annotation JSON,
split lists, jsfusion caption-idx pickle, per-video npz region dirs)."""
import json
import os

import numpy as np
import pytest

from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.regions import FEAT_DIM


def _write_frame(path, n=6, seed=0):
    rng = np.random.RandomState(seed)
    w, h = 320, 240
    x1 = rng.uniform(0, w / 2, n)
    y1 = rng.uniform(0, h / 2, n)
    bbox = np.stack(
        [x1, y1, x1 + rng.uniform(1, w / 2, n), y1 + rng.uniform(1, h / 2, n)],
        axis=1,
    ).astype(np.float32)
    info = {
        "objects_conf": rng.rand(n).astype(np.float32),
        "objects_id": rng.randint(0, 100, n),
        "image_w": w,
        "image_h": h,
    }
    np.savez(path, x=rng.randn(n, FEAT_DIM).astype(np.float32), bbox=bbox, info=info)


@pytest.fixture()
def msrvtt_tree(tmp_path):
    meta = tmp_path / "meta"
    ann = meta / "annotation"
    splits = meta / "high-quality" / "structured-symlinks"
    ann.mkdir(parents=True)
    splits.mkdir(parents=True)

    vids = [f"video{i}" for i in range(6)]
    annotations = [
        {"image_id": v, "caption": f"caption {i} for {v}"}
        for v in vids
        for i in range(3)
    ]
    (ann / "MSR_VTT.json").write_text(json.dumps({"annotations": annotations}))
    (splits / "train_list_jsfusion.txt").write_text("\n".join(vids[:4]))
    (splits / "val_list_jsfusion.txt").write_text("\n".join(vids[4:]))
    # jsfusion protocol: fixed caption index per val video
    cap_idx = np.array([1, 2], dtype=object)
    np.save(splits / "jsfusion_val_caption_idx.pkl", cap_idx, allow_pickle=True)
    os.replace(
        splits / "jsfusion_val_caption_idx.pkl.npy",
        splits / "jsfusion_val_caption_idx.pkl",
    )

    objdir = tmp_path / "objects"
    for i, v in enumerate(vids):
        d = objdir / v
        d.mkdir(parents=True)
        for f in range(4):
            _write_frame(str(d / f"{f}.npz"), seed=i * 10 + f)
    return meta, objdir


def test_msrvtt_train_split(msrvtt_tree):
    meta, objdir = msrvtt_tree
    ds = dataset_object_loader(
        "MSRVTTObjectSelect",
        text_params={},
        object_params={"num_frames": 2, "object_num": 4},
        data_dir=str(meta),
        object_dir=str(objdir),
        metadata_dir=str(meta),
        split="train",
        cut="jsfusion",
    )
    assert len(ds) == 4
    item = ds[0]
    assert item["object"].shape == (2, 4, 2054)
    assert item["text"].startswith("caption")


def test_msrvtt_val_uses_jsfusion_caption_idx(msrvtt_tree):
    meta, objdir = msrvtt_tree
    ds = dataset_object_loader(
        "MSRVTTObjectSelect",
        text_params={},
        object_params={"num_frames": 2, "object_num": 4},
        data_dir=str(meta),
        object_dir=str(objdir),
        metadata_dir=str(meta),
        split="test",
        cut="jsfusion",
    )
    assert len(ds) == 2
    # caption list collapsed to the single indexed caption per video
    texts = {ds[i]["text"] for i in range(2)}
    assert texts == {"caption 1 for video4", "caption 2 for video5"}
