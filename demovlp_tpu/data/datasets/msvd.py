"""MSVD retrieval + QA adapters (reference data_loader/MSVD_dataset.py).

Retrieval metadata: ./meta_data/MSVD_{train,test}.tsv, headerless
"cap1, cap2, ...\\tvideo_id"; first comma-field used as the caption.
QA: msvd_answer_set.txt (line index = label), msvd_youtube_mapping.txt
("youtube_id vidN"), msvd_{split}_qa_encode.json; answer_type = first
question word. Regions: {object_dir}/{video_id or youtube_id}/{frame}.npz.
"""
from __future__ import annotations

import os
import random
from typing import Any, Dict

import numpy as np
import pandas as pd

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.datasets.msrvtt import meta_data_dir
from demovlp_tpu.utils import load_json


class MSVDObjectSelect(RegionDataset):
    def _load_metadata(self):
        split_files = {
            "train": "MSVD_train.tsv",
            "val": "MSVD_test.tsv",
            "test": "MSVD_test.tsv",
        }
        metadata = pd.read_csv(
            os.path.join(meta_data_dir(), split_files[self.split]),
            sep="\t",
            header=None,
            names=["caption", "vid"],
        )
        if self.subsample < 1:
            metadata = metadata.sample(frac=self.subsample)
        self.metadata = metadata

    def _object_path(self, index: int) -> str:
        return os.path.join(self.object_dir, self.metadata.iloc[index]["vid"])

    def _text(self, index: int, rng) -> str:
        # first of the comma-joined captions (reference MSVD_dataset.py:54-55)
        return self.metadata.iloc[index]["caption"].split(",")[0]

    def _vectorized_text_lengths(self):
        # the "caption" column is comma-joined; _text serves only the first
        # segment, so count that (the base-class path would count them all)
        col = self.metadata["caption"]
        if len(col) != len(self) or not col.map(
            lambda t: isinstance(t, str)
        ).all():
            return None
        return (
            col.str.split(",").str[0].str.split().str.len()
            .to_numpy(np.int32)
        )


class MSVDQAObjectSelect(RegionDataset):
    def _load_metadata(self):
        meta_dir = meta_data_dir()
        self.ans2label = {}
        with open(os.path.join(meta_dir, "msvd_answer_set.txt")) as f:
            for idx, label in enumerate(f.readlines()):
                self.ans2label[label.strip()] = idx
        self.vid2link = {}
        with open(os.path.join(meta_dir, "msvd_youtube_mapping.txt")) as f:
            for line in f.readlines():
                link, vid = line.strip().split(" ")
                self.vid2link[int(vid[3:])] = link

        split_files = {
            "train": "msvd_train_qa_encode.json",
            "test": "msvd_test_qa_encode.json",
            "val": "msvd_val_qa_encode.json",
        }
        raw = load_json(os.path.join(meta_dir, split_files[self.split]))
        if self.subsample < 1:
            n = int(len(raw) * self.subsample)
            random.shuffle(raw)
            raw = raw[:n]
        self.metadata = [
            dict(
                question=d["question"],
                vid_id=d["video_id"],
                answer=d["answer"],
                question_id=d["id"],
                answer_type=d["question"].split(" ")[0],
            )
            for d in raw
        ]
        self.num_labels = len(self.ans2label)
        self.label2ans = {v: k for k, v in self.ans2label.items()}
        self.qid2data = {d["question_id"]: d for d in self.metadata}

    def _object_path(self, index: int) -> str:
        link = self.vid2link[self.metadata[index]["vid_id"]]
        return os.path.join(self.object_dir, link)

    def _text(self, index: int, rng) -> str:
        return self.metadata[index]["question"]

    def _extras(self, index: int) -> Dict[str, Any]:
        d = self.metadata[index]
        label = self.ans2label[d["answer"]] if self.split == "train" else -1
        return {"label": label, "question_id": d["question_id"]}
