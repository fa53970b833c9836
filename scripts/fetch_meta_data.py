#!/usr/bin/env python
"""Populate ./meta_data from a DemoVLP-style checkout or dataset preparation.

The reference ships dataset split metadata in-repo (meta_data/*.tsv|jsonl|
json|txt — SURVEY.md §2 #28). Those files are third-party dataset artifacts,
so this framework pulls them from an existing checkout / download instead of
vendoring them:

    python scripts/fetch_meta_data.py [--src /path/to/DemoVLP/meta_data]

The small split files are also vendored in-repo under ./meta_data (matching
the reference, which ships them in-tree); this script refreshes them from a
checkout or pulls the 4 large train files the reference marks as missing
(.MISSING_LARGE_BLOBS) once you have a full download.

Only the known split files are copied; anything missing is reported so you
know which datasets are usable.
"""
from __future__ import annotations

import argparse
import shutil
from pathlib import Path

EXPECTED = [
    # WebVid / CC3M pre-training
    "webvid_training_success_full.tsv",
    "webvid_validation_success_full.tsv",
    "cc3m_training_success_full.tsv",
    "cc3m_validation_success_full.tsv",
    # MSRVTT QA / MC
    "msrvtt_qa_train.jsonl",
    "msrvtt_qa_val.jsonl",
    "msrvtt_qa_test.jsonl",
    "msrvtt_train_ans2label.json",
    "msrvtt_mc_test.jsonl",
    # MSVD retrieval / QA
    "MSVD_train.tsv",
    "MSVD_val.tsv",
    "MSVD_test.tsv",
    "msvd_answer_set.txt",
    "msvd_youtube_mapping.txt",
    "msvd_train_qa_encode.json",
    "msvd_val_qa_encode.json",
    "msvd_test_qa_encode.json",
    # DiDeMo
    "DiDeMo_train.tsv",
    "DiDeMo_val.tsv",
    "DiDeMo_test.tsv",
    # TGIF-FrameQA
    "frameqa_train.jsonl",
    "frameqa_val.jsonl",
    "frameqa_test.jsonl",
    "frameqa_trainval_ans2label.json",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--src",
        default="/root/reference/meta_data",
        help="source meta_data directory (defaults to the mounted reference checkout)",
    )
    ap.add_argument("--dst", default="./meta_data")
    args = ap.parse_args()

    src, dst = Path(args.src), Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    copied, missing = [], []
    for name in EXPECTED:
        s = src / name
        if s.exists():
            shutil.copy2(s, dst / name)
            copied.append(name)
        else:
            missing.append(name)
    print(f"copied {len(copied)} files to {dst}")
    if missing:
        print("missing (datasets relying on them will be unavailable):")
        for name in missing:
            print(f"  - {name}")


if __name__ == "__main__":
    main()
