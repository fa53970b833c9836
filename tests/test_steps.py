import numpy as np
import pytest

from demovlp_tpu.train.steps import pad_batch, prepare_batch
from demovlp_tpu.train.checkpoint import find_latest_checkpoint
from demovlp_tpu.data.tokenizer import SimpleTokenizer


def test_pad_batch():
    arrays = {
        "a": np.arange(12).reshape(3, 4).astype(np.float32),
        "b": np.arange(3).astype(np.int32),
    }
    padded, n = pad_batch(arrays, 5)
    assert n == 3
    assert padded["a"].shape == (5, 4)
    np.testing.assert_array_equal(padded["a"][3], padded["a"][0])
    np.testing.assert_array_equal(padded["b"][:3], arrays["b"])
    # already full: identity
    same, n2 = pad_batch(arrays, 3)
    assert n2 == 3 and same is arrays


def test_prepare_batch_flattens_mc_options():
    tok = SimpleTokenizer(max_length=16)
    batch = {
        "text": [["opt a", "opt b", "opt c"]],
        "object": np.zeros((1, 2, 4, 2054), np.float32),
        "object_mask": np.ones((1, 2, 4), np.float32),
    }
    arrays = prepare_batch(batch, tok, max_text_len=16)
    assert arrays["input_ids"].shape == (3, 16)  # options flattened


def test_prepare_batch_includes_label():
    tok = SimpleTokenizer(max_length=16)
    batch = {
        "text": ["q1", "q2"],
        "object": np.zeros((2, 1, 4, 2054), np.float32),
        "object_mask": np.ones((2, 1, 4), np.float32),
        "label": np.array([3, 7], np.int32),
    }
    arrays = prepare_batch(batch, tok, max_text_len=16)
    np.testing.assert_array_equal(arrays["label"], [3, 7])


def test_find_latest_checkpoint(tmp_path):
    assert find_latest_checkpoint(tmp_path, "exp") is None
    base = tmp_path / "models" / "exp"
    (base / "0101_000000" / "checkpoint-epoch2").mkdir(parents=True)
    (base / "0102_000000" / "checkpoint-epoch1").mkdir(parents=True)
    (base / "0102_000000" / "checkpoint-epoch3").mkdir(parents=True)
    latest = find_latest_checkpoint(tmp_path, "exp")
    assert latest.name == "checkpoint-epoch3"
    assert latest.parent.name == "0102_000000"
