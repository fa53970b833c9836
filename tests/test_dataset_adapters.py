"""Remaining dataset adapters against synthetic metadata + region trees
(WebVid, CC3M, MSVD retrieval+QA, DiDeMo, TGIF, LSMDC retrieval+MC)."""
import json
import os

import numpy as np
import pytest

from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.regions import FEAT_DIM


def _write_frame(path, n=5, seed=0):
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


def _video_dir(root, rel, n_frames=4, seed=0):
    d = root / rel
    d.mkdir(parents=True, exist_ok=True)
    for f in range(n_frames):
        _write_frame(str(d / f"{f}.npz"), seed=seed * 10 + f)
    return d


@pytest.fixture()
def meta_env(tmp_path, monkeypatch):
    meta = tmp_path / "meta_data"
    meta.mkdir()
    monkeypatch.setenv("DEMOVLP_META_DIR", str(meta))
    return meta, tmp_path


OBJ_P = {"num_frames": 2, "object_num": 4}


def test_webvid(meta_env):
    meta, root = meta_env
    (meta / "webvid_training_success_full.tsv").write_text(
        "a cat video\t000001_000050/123\nanother clip\t000001_000050/456\n"
    )
    objdir = root / "wv"
    _video_dir(objdir / "train", "000001_000050/123", n_frames=2)
    _video_dir(objdir / "train", "000001_000050/456", n_frames=8)
    ds = dataset_object_loader(
        "WebVidObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["object"].shape == (2, 4, 2054)


def test_cc3m(meta_env):
    meta, root = meta_env
    (meta / "cc3m_training_success_full.tsv").write_text(
        "a photo caption\t12_3456789\n"
    )
    objdir = root / "cc"
    d = objdir / "train" / "0000012"[:7][:4]  # zfill(7)[:4] of '12' == '0000'
    d.mkdir(parents=True)
    _write_frame(str(d / "12_3456789_1.npz"))
    ds = dataset_object_loader(
        "ConceptualCaptions3MObjectSelect", text_params={},
        object_params={"num_frames": 1, "object_num": 4},
        object_dir=str(objdir), split="train",
    )
    item = ds[0]
    assert item["object"].shape == (1, 4, 2054)
    assert item["text"] == "a photo caption"


def test_msvd_retrieval_and_qa(meta_env):
    meta, root = meta_env
    (meta / "MSVD_train.tsv").write_text(
        "cap one, cap two, cap three\tvidA_1_10\n"
    )
    (meta / "msvd_answer_set.txt").write_text("man\nwoman\n")
    (meta / "msvd_youtube_mapping.txt").write_text("vidA_1_10 vid1\n")
    (meta / "msvd_train_qa_encode.json").write_text(json.dumps(
        [{"question": "who walks ?", "answer": "man", "video_id": 1, "id": 0}]
    ))
    objdir = root / "msvd"
    _video_dir(objdir, "vidA_1_10", n_frames=3)

    ds = dataset_object_loader(
        "MSVDObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    assert ds[0]["text"] == "cap one"

    qa = dataset_object_loader(
        "MSVDQAObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    item = qa[0]
    assert item["label"] == 0  # 'man'
    assert item["text"] == "who walks ?"
    assert qa.qid2data[0]["answer_type"] == "who"


def test_didemo(meta_env):
    meta, root = meta_env
    (meta / "DiDeMo_train.tsv").write_text(
        "a street scene, more text\tuser_12345_abc.mp4\n"
    )
    objdir = root / "dd"
    _video_dir(objdir, "user_12345_abc", n_frames=3)
    ds = dataset_object_loader(
        "DiDeMoObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    assert ds[0]["object"].shape == (2, 4, 2054)


def test_tgif(meta_env):
    meta, root = meta_env
    (meta / "frameqa_trainval_ans2label.json").write_text(
        json.dumps({"bomb": 0, "cat": 1})
    )
    (meta / "frameqa_train.jsonl").write_text(
        json.dumps({"gif_name": "tumblr_x", "question": "what drops ?",
                    "answer": "bomb", "answer_type": "object"})
    )
    objdir = root / "tg"
    _video_dir(objdir, "tumblr_x", n_frames=3)
    ds = dataset_object_loader(
        "TGIFFrameObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    item = ds[0]
    assert item["label"] == 0
    assert item["question_id"] == 0


def test_lsmdc_retrieval_and_mc(meta_env, tmp_path):
    meta, root = meta_env
    data_dir = root / "lsmdc"
    (data_dir / "meta_data").mkdir(parents=True)
    clip = "0001_Movie_00.02.03.456-00.02.05.678"
    (data_dir / "meta_data" / "LSMDC16_annos_training.csv").write_text(
        f"{clip}\tx\ty\tz\tw\tsomeone walks away\n"
    )
    # MC: cols 0..4 meta, 5..9 options, last answer (1-indexed)
    opts = "\t".join([f"option {i}" for i in range(5)])
    (data_dir / "meta_data" / "LSMDC16_multiple_choice_test_randomized.csv").write_text(
        f"{clip}\tx\ty\tz\tw\t{opts}\t2\n"
    )
    objdir = root / "lsobj"
    # reconstruction: "0001_Movie_00.02..." -> movie dir "0001_Movie/" + clip
    _video_dir(objdir, "0001_Movie/" + clip, n_frames=3)

    ds = dataset_object_loader(
        "LSMDCObjectSelect", text_params={}, object_params=OBJ_P,
        data_dir=str(data_dir), object_dir=str(objdir), split="train",
    )
    assert ds[0]["text"] == "someone walks away"

    mc = dataset_object_loader(
        "LSMDCMCObjectSelect", text_params={}, object_params=OBJ_P,
        data_dir=str(data_dir), object_dir=str(objdir), split="test",
    )
    item = mc[0]
    assert item["text"] == [f"option {i}" for i in range(5)]
    assert item["label"] == 1  # answer col 2 -> index 1
    assert mc.id2answer[clip] == 1


def _loop_text_lengths(ds):
    """The per-sample reference path for text_lengths (base.py fallback),
    run explicitly to pin the vectorized fast path against it."""
    rng = np.random.default_rng(0)
    out = []
    for i in range(len(ds)):
        t = ds._text(i, rng)
        if isinstance(t, (list, tuple)):
            t = max((str(x) for x in t), key=len, default="")
        out.append(len(str(t).split()))
    return np.asarray(out, np.int32)


def test_text_lengths_vectorized_matches_loop(meta_env):
    """The pandas-vectorized text_lengths fast path (incl. MSVD's
    comma-joined caption column, where only the first segment counts) must
    agree with the per-sample loop, and the result is cached per instance."""
    meta, root = meta_env
    (meta / "webvid_training_success_full.tsv").write_text(
        "a cat video plays\t000001_000050/123\nclip\t000001_000050/456\n"
    )
    (meta / "MSVD_train.tsv").write_text(
        "cap one word, a much longer second caption here\tvidA_1_10\n"
        "single\tvidB_2_20\n"
    )
    objdir = root / "tl"
    for rel in ("000001_000050/123", "000001_000050/456"):
        _video_dir(objdir / "train", rel, n_frames=2)
    for rel in ("vidA_1_10", "vidB_2_20"):
        _video_dir(objdir, rel, n_frames=2)

    wv = dataset_object_loader(
        "WebVidObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    msvd = dataset_object_loader(
        "MSVDObjectSelect", text_params={}, object_params=OBJ_P,
        object_dir=str(objdir), split="train",
    )
    for ds in (wv, msvd):
        # the fast path must be the one actually taken on these frames
        assert ds._vectorized_text_lengths() is not None
        lens = ds.text_lengths()
        np.testing.assert_array_equal(lens, _loop_text_lengths(ds))
        assert ds.text_lengths() is lens  # instance cache
    assert msvd.text_lengths().tolist() == [3, 1]  # first comma segment only
