"""Host-side text tokenization with an offline-safe fallback.

The reference tokenizes with a HuggingFace AutoTokenizer
(train_dist_multi.py:43) as `tokenizer(text, pad_to_max_length=True,
truncation=True, max_length=100)` (trainer/trainer_dist.py:133-137) — i.e.
every batch is exactly (B, 100): the fixed-shape contract XLA wants.

`build_tokenizer` loads the HF tokenizer from a local path when available
(zero-egress environments can't download), else falls back to
`SimpleTokenizer`, a deterministic lowercase/whitespace+punct tokenizer with
hashed ids in the DistilBERT vocab range — architecture-compatible (same
special-token layout: [CLS] x ... [SEP] pad) so the whole pipeline runs
without pretrained assets.
"""
from __future__ import annotations

import os
import re
from typing import List, Sequence, Union

import numpy as np

MAX_TEXT_LEN = 100  # reference trainer/trainer_dist.py:137


class SimpleTokenizer:
    """Deterministic fallback tokenizer (DistilBERT-shaped ids)."""

    PAD_ID = 0
    UNK_ID = 100
    CLS_ID = 101
    SEP_ID = 102
    # hash non-special tokens into [1000, vocab_size)
    HASH_LO = 1000

    def __init__(self, vocab_size: int = 30522, max_length: int = MAX_TEXT_LEN):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self._word_re = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")

    def _token_ids(self, text: str) -> List[int]:
        toks = self._word_re.findall(text.lower())
        span = self.vocab_size - self.HASH_LO
        ids = []
        for t in toks:
            # FNV-1a 32-bit — stable across processes (unlike hash())
            h = 2166136261
            for ch in t.encode("utf8"):
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            ids.append(self.HASH_LO + (h % span))
        return ids

    def __call__(
        self,
        text: Union[str, Sequence[str]],
        max_length: int | None = None,
        **_,
    ):
        if isinstance(text, str):
            text = [text]
        L = max_length or self.max_length
        B = len(text)
        input_ids = np.full((B, L), self.PAD_ID, dtype=np.int32)
        attention_mask = np.zeros((B, L), dtype=np.int32)
        for i, t in enumerate(text):
            ids = [self.CLS_ID] + self._token_ids(t)[: L - 2] + [self.SEP_ID]
            input_ids[i, : len(ids)] = ids
            attention_mask[i, : len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}


class _HFTokenizerWrapper:
    """Normalizes a HF tokenizer to the numpy fixed-shape protocol."""

    def __init__(self, hf_tokenizer, max_length: int = MAX_TEXT_LEN):
        self.hf = hf_tokenizer
        self.max_length = max_length

    def __call__(self, text, max_length: int | None = None, **_):
        if isinstance(text, str):
            text = [text]
        enc = self.hf(
            list(text),
            padding="max_length",
            truncation=True,
            max_length=max_length or self.max_length,
            return_tensors="np",
        )
        return {
            "input_ids": enc["input_ids"].astype(np.int32),
            "attention_mask": enc["attention_mask"].astype(np.int32),
        }


def build_tokenizer(model_name_or_path: str = "", max_length: int = MAX_TEXT_LEN):
    """HF tokenizer from a local path if present, else SimpleTokenizer."""
    if model_name_or_path:
        try:
            from transformers import AutoTokenizer

            local_only = not os.environ.get("DEMOVLP_ALLOW_DOWNLOAD")
            hf = AutoTokenizer.from_pretrained(
                model_name_or_path,
                local_files_only=local_only,
                TOKENIZERS_PARALLELISM=False,
            )
            return _HFTokenizerWrapper(hf, max_length)
        except Exception:
            pass
    return SimpleTokenizer(max_length=max_length)
