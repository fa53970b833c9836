import numpy as np
import pytest

from demovlp_tpu.data.mlm import mask_batch_text_tokens
from demovlp_tpu.utils import (
    flat_list_of_lists,
    merge_dicts,
    replace_nested_dict_item,
    load_jsonl,
    save_jsonl,
)
from demovlp_tpu.utils.io import compute_iou
from demovlp_tpu.utils.writer import MetricsWriter
from demovlp_tpu.utils.visualizer import RetrievalVis


def test_flat_and_merge():
    assert flat_list_of_lists([[1, 2], [3]]) == [1, 2, 3]
    assert merge_dicts([{"a": 1}, {"b": 2}, {"a": 3}]) == {"a": 3, "b": 2}
    d = {"x": {"y": 1}, "y": 0}
    out = replace_nested_dict_item(d, "y", 9)
    assert out["x"]["y"] == 9 and out["y"] == 9


def test_jsonl_roundtrip(tmp_path):
    data = [{"a": 1}, {"b": [1, 2]}]
    p = tmp_path / "x.jsonl"
    save_jsonl(data, p)
    assert load_jsonl(p) == data


def test_compute_iou():
    assert compute_iou([0, 0, 2, 2], [0, 0, 2, 2]) == pytest.approx(1.0)
    assert compute_iou([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0
    assert compute_iou([0, 0, 2, 2], [1, 1, 3, 3]) == pytest.approx(1 / 7)


def test_mlm_masking_distribution():
    rng = np.random.default_rng(0)
    b, l = 64, 100
    ids = rng.integers(1000, 2000, size=(b, l)).astype(np.int32)
    mask = np.ones((b, l), np.int32)
    mask[:, 90:] = 0
    masked, labels = mask_batch_text_tokens(
        ids, mask, mask_token_id=103, vocab_size=30522, rng=rng
    )
    sel = labels != -100
    frac = sel.mean()
    assert 0.10 < frac < 0.20  # ~15%
    # padded positions never selected
    assert not sel[:, 90:].any()
    # labels preserve original ids at selected positions
    np.testing.assert_array_equal(labels[sel], ids[sel])
    # ~80% of selected are [MASK]
    mask_frac = (masked[sel] == 103).mean()
    assert 0.7 < mask_frac < 0.9
    # unselected positions unchanged
    np.testing.assert_array_equal(masked[~sel], ids[~sel])


def test_metrics_writer(tmp_path):
    w = MetricsWriter(tmp_path, use_tensorboard=False)
    w.set_step(0, "train")
    w.log_scalar("loss", 1.5)
    w.set_step(10, "train")
    w.log_scalar("loss", 1.0)
    w.close()
    lines = (tmp_path / "scalars.jsonl").read_text().strip().split("\n")
    assert len(lines) >= 2


def test_retrieval_vis_writes_html(tmp_path):
    vis = RetrievalVis("exp", str(tmp_path / "web"), vis_vid_freq=1, num_samples=3)
    n = 6
    sims = np.eye(n) + np.random.RandomState(0).rand(n, n) * 0.1
    meta = {
        "paths": [f"v{i}.mp4" for i in range(n)],
        "raw_captions": [f"caption {i}" for i in range(n)],
    }
    vis.visualize_ranking(
        sims, epoch=1, meta=meta,
        nested_metrics={"t2v_metrics": {"R1": 100.0, "R5": 100.0, "R10": 100.0, "MedR": 1.0}},
    )
    html = (tmp_path / "web" / "index.html").read_text()
    assert "caption 0" in html or "caption 1" in html
    assert "R1: 100.0" in html
    # off-frequency epochs skip writing
    vis2 = RetrievalVis("exp", str(tmp_path / "web2"), vis_vid_freq=2, num_samples=3)
    vis2.visualize_ranking(sims, epoch=1, meta=meta, nested_metrics={})
    assert not (tmp_path / "web2" / "index.html").exists()


def test_experiment_writer_forwards_scalars(tmp_path):
    """trainer.neptune parity: scalars reach the attached experiment object
    (sacred Experiment duck-type) AND the JSONL sink; a broken experiment
    must not raise."""
    from demovlp_tpu.utils.writer import ExperimentWriter

    class FakeExperiment:
        def __init__(self):
            self.calls = []

        def log_scalar(self, name, value, step):
            self.calls.append((name, value, step))

    exp = FakeExperiment()
    w = ExperimentWriter(tmp_path, experiment=exp, use_tensorboard=False)
    w.set_step(0, "train")
    w.log_scalar("loss", 1.5)
    w.close()
    assert exp.calls == [("train/loss", 1.5, 0)]
    lines = (tmp_path / "scalars.jsonl").read_text().strip().splitlines()
    assert any('"train/loss"' in ln for ln in lines)

    class Broken:
        def log_scalar(self, *a):
            raise RuntimeError("backend down")

    w2 = ExperimentWriter(tmp_path, experiment=Broken(), use_tensorboard=False)
    w2.log_scalar("loss", 2.0)  # must not raise
    w2.close()
