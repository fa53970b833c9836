import numpy as np
import pytest

from demovlp_tpu.metrics import (
    t2v_metrics,
    v2t_metrics,
    cols2metrics,
    evaluate_qa,
    evaluate_mc,
)


def test_t2v_perfect_ranking():
    n = 10
    sims = np.eye(n) + np.random.RandomState(0).rand(n, n) * 0.01
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0
    assert m["MedR"] == 1.0


def test_t2v_multi_caption_gt_slicing():
    # 2 captions per video; caption i's gt video is i // 2
    num_vids, k = 4, 2
    rng = np.random.RandomState(1)
    sims = rng.rand(num_vids * k, num_vids)
    for j in range(num_vids):
        sims[j * k: (j + 1) * k, j] += 10.0  # make gt clearly best
    m = t2v_metrics(sims)
    assert m["R1"] == 100.0


def test_t2v_tie_breaking_optimistic_vs_averaging():
    sims = np.zeros((4, 4))  # everything tied
    m_opt = t2v_metrics(sims, break_ties="optimistically")
    m_avg = t2v_metrics(sims, break_ties="averaging")
    # optimistic: every query gets rank 0 on a constant matrix
    assert m_opt["R1"] == 100.0
    # averaging: every query's gt rank is the mean of 0..3 = 1.5
    assert m_avg["R1"] == 0.0
    assert m_avg["MedR"] == 2.5


def test_t2v_query_masks():
    n = 4
    sims = np.eye(n) * 10 + np.random.RandomState(2).rand(n, n)
    mask = np.array([1, 1, 0, 1])
    m = t2v_metrics(sims, query_masks=mask)
    assert m["R1"] == 100.0


def test_v2t_min_rank_over_captions():
    # 2 captions per video; only the second caption of each video is close
    num_vids, k = 3, 2
    sims = np.zeros((num_vids * k, num_vids))
    for j in range(num_vids):
        sims[j * k + 1, j] = 5.0  # second caption strongly matches
    m = v2t_metrics(sims)
    assert m["R1"] == 100.0


def test_v2t_toy_example_from_reference_debug_branch():
    # reference metric.py:143-149 toy: with averaging ties
    sims = np.ones((3, 3))
    sims[0, 0] = 2
    sims[1, 1:2] = 2
    sims[2, :] = 2
    m = v2t_metrics(sims.T)  # v2t transposes internally
    assert np.isfinite(m["MeanR"])


def test_cols2metrics_values():
    cols = np.array([0, 0, 4, 9, 49, 100])
    m = cols2metrics(cols, 6)
    assert m["R1"] == pytest.approx(100 * 2 / 6)
    assert m["R5"] == pytest.approx(100 * 3 / 6)
    assert m["R10"] == pytest.approx(100 * 4 / 6)
    assert m["R50"] == pytest.approx(100 * 5 / 6)
    assert m["MedR"] == pytest.approx(np.median(cols) + 1)
    assert m["MeanR"] == pytest.approx(np.mean(cols) + 1)


def test_evaluate_qa():
    label2ans = {0: "cat", 1: "dog"}
    qid2data = {
        0: {"answer": "cat", "answer_type": "what"},
        1: {"answer": "dog", "answer_type": "who"},
        2: {"answer": "cat", "answer_type": "what"},
    }
    results = [
        {"question_id": 0, "answer": 0},
        {"question_id": 1, "answer": 0},
        {"question_id": 2, "answer": 0},
    ]
    m = evaluate_qa(results, label2ans, qid2data)
    assert m["overall_acc"] == pytest.approx(2 / 3)
    assert m["what_acc"] == pytest.approx(1.0)
    assert m["who_acc"] == pytest.approx(0.0)
    assert m["how_acc"] == 0


def test_evaluate_mc():
    pred = {"a": 1, "b": 2, "c": 3}
    gt = {"a": 1, "b": 0, "c": 3}
    m = evaluate_mc(pred, gt)
    assert m["mc_accuracy"] == "66.67"
