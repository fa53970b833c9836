"""BERT-style masked-language-model token masking (80/10/10).

Parity component for the reference's mask_batch_text_tokens
(utils/util.py:193-240 — shipped but never called there; BASELINE.json lists
contrastive+MLM as a pre-training objective, so the rebuild keeps the helper
first-class and tested). Pure numpy, deterministic under a Generator;
labels are -100 for unmasked positions (the CE ignore convention).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def mask_batch_text_tokens(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    mask_token_id: int,
    vocab_size: int,
    rng: np.random.Generator,
    mlm_probability: float = 0.15,
    special_ids: Tuple[int, ...] = (0, 101, 102),
    ignore_index: int = -100,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (masked_input_ids, labels). Of the selected positions, 80%
    become [MASK], 10% a random token, 10% stay unchanged."""
    ids = input_ids.copy()
    labels = ids.copy()

    special = np.isin(ids, np.asarray(special_ids))
    candidates = (attention_mask > 0) & ~special
    probs = np.where(candidates, mlm_probability, 0.0)
    masked = rng.random(ids.shape) < probs
    labels[~masked] = ignore_index

    replace_mask = masked & (rng.random(ids.shape) < 0.8)
    ids[replace_mask] = mask_token_id

    random_mask = masked & ~replace_mask & (rng.random(ids.shape) < 0.5)
    ids[random_mask] = rng.integers(0, vocab_size, size=ids.shape)[random_mask]
    # remaining 10%: keep original token
    return ids, labels
