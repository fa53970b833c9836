"""Video-QA and multiple-choice metrics (reference model/metric.py:217-295)."""
from __future__ import annotations

import numpy as np

ANSWER_TYPES = (
    "what",
    "who",
    "how",
    "where",
    "when",
    "object",
    "number",
    "color",
    "location",
)


def evaluate_qa(results, label2ans, qid2data):
    """Overall + per-answer-type accuracy.

    Args:
      results: list of {"question_id": int, "answer": int (label idx)}
      label2ans: {label_idx: answer string}
      qid2data: {question_id: {"answer": str, "answer_type": str, ...}}
    """
    answer_type2idx = {k: idx for idx, k in enumerate(ANSWER_TYPES)}

    preds, gts, answer_types = [], [], []
    qid2pred_ans = {r["question_id"]: label2ans[r["answer"]] for r in results}
    for qid, pred_ans in qid2pred_ans.items():
        preds.append(pred_ans)
        gt_data = qid2data[qid]
        answer_types.append(answer_type2idx[gt_data["answer_type"]])
        gts.append(gt_data["answer"])

    preds = np.array(preds)
    gts = np.array(gts)
    answer_types = np.array(answer_types)

    metrics = {"overall_acc": float(np.mean(preds == gts))}
    ratios = {}
    for ans_type, ans_type_idx in answer_type2idx.items():
        mask = answer_types == ans_type_idx
        corrects = preds[mask] == gts[mask]
        metrics[f"{ans_type}_acc"] = (
            float(np.mean(corrects)) if len(corrects) != 0 else 0
        )
        ratios[f"{ans_type}_ratio"] = [
            1.0 * len(corrects) / len(answer_types),
            len(corrects),
        ]
    metrics["ratios"] = ratios
    return metrics


def evaluate_mc(pred_id2answer, gt_id2answer):
    """5-way multiple-choice accuracy, scored over the predicted ids."""
    shared_ids = list(pred_id2answer.keys())
    gt_answers = np.array([gt_id2answer[k] for k in shared_ids])
    pred_answers = np.array([pred_id2answer[k] for k in shared_ids])
    acc = np.mean(gt_answers == pred_answers)
    return dict(mc_accuracy=f"{100 * acc:.2f}")
