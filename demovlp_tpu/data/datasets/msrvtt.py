"""MSRVTT retrieval / QA / MC adapters (reference data_loader/MSRVTT_dataset.py).

Metadata layout (same on-disk expectations as the reference):
  retrieval: {metadata_dir}/annotation/MSR_VTT.json +
             {metadata_dir}/high-quality/structured-symlinks/<cut lists>
  QA:        ./meta_data/msrvtt_qa_{split}.jsonl + msrvtt_train_ans2label.json
  MC:        ./meta_data/msrvtt_mc_test.jsonl
  regions:   {object_dir}/{video_id}/{frame}.npz
"""
from __future__ import annotations

import json
import os
import random
from typing import Any, Dict

import numpy as np
import pandas as pd

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.utils import load_json, load_jsonl

def meta_data_dir() -> str:
    """Shipped-split metadata dir (reference hardcodes ./meta_data; overridable
    via DEMOVLP_META_DIR)."""
    return os.environ.get("DEMOVLP_META_DIR", "./meta_data")


class MSRVTTObjectSelect(RegionDataset):
    def _load_metadata(self):
        json_fp = os.path.join(self.metadata_dir, "annotation", "MSR_VTT.json")
        with open(json_fp, "r") as fid:
            data = json.load(fid)
        df = pd.DataFrame(data["annotations"])

        split_dir = os.path.join(
            self.metadata_dir, "high-quality", "structured-symlinks"
        )
        js_test_cap_idx_path = None
        challenge_splits = {"val", "public_server_val", "public_server_test"}
        if self.cut == "miech":
            train_list_path, test_list_path = "train_list_miech.txt", "test_list_miech.txt"
        elif self.cut == "jsfusion":
            train_list_path, test_list_path = (
                "train_list_jsfusion.txt",
                "val_list_jsfusion.txt",
            )
            # one caption per video for the jsfusion eval protocol
            js_test_cap_idx_path = "jsfusion_val_caption_idx.pkl"
        elif self.cut in {"full-val", "full-test"}:
            train_list_path = "train_list_full.txt"
            test_list_path = (
                "val_list_full.txt" if self.cut == "full-val" else "test_list_full.txt"
            )
        elif self.cut in challenge_splits:
            train_list_path = "train_list.txt"
            test_list_path = (
                f"{self.cut}_list.txt" if self.cut == "val" else f"{self.cut}.txt"
            )
        else:
            raise ValueError(f"unrecognised MSRVTT split: {self.cut}")

        train_df = pd.read_csv(os.path.join(split_dir, train_list_path), names=["videoid"])
        test_df = pd.read_csv(os.path.join(split_dir, test_list_path), names=["videoid"])
        self.split_sizes = {
            "train": len(train_df),
            "val": len(test_df),
            "test": len(test_df),
        }

        if self.split == "train":
            df = df[df["image_id"].isin(train_df["videoid"])]
        else:
            df = df[df["image_id"].isin(test_df["videoid"])]

        caps = df.groupby(["image_id"])["caption"].apply(list)
        if self.subsample < 1:
            caps = caps.sample(frac=self.subsample)

        if js_test_cap_idx_path is not None and self.split != "train":
            loaded = np.load(
                os.path.join(split_dir, js_test_cap_idx_path), allow_pickle=True
            )
            if isinstance(loaded, pd.Series):
                cap_idx = loaded  # pickled Series keyed by video id
            else:
                # raw array: positional, aligned with the (sorted) video ids
                cap_idx = pd.Series(list(np.asarray(loaded).ravel()), index=caps.index)
            frame = pd.DataFrame({"caps": caps, "cap_idx": cap_idx})
            caps = frame.apply(lambda r: [r["caps"][int(r["cap_idx"])]], axis=1)

        self.metadata = pd.DataFrame({"captions": caps})

    def _object_path(self, index: int) -> str:
        video_id = self.metadata.index[index]
        return os.path.join(self.object_dir, video_id)

    def _text(self, index: int, rng: np.random.Generator) -> str:
        captions = self.metadata.iloc[index]["captions"]
        sample_mode = self.text_params.get("caption_sample", "rand")
        if self.split in ("train", "val") and sample_mode == "rand":
            return captions[int(rng.integers(0, len(captions)))]
        return captions[0]


class MSRVTTQAObjectSelect(RegionDataset):
    def _load_metadata(self):
        meta_dir = meta_data_dir()
        self.ans2label = load_json(os.path.join(meta_dir, "msrvtt_train_ans2label.json"))
        split_files = {
            "train": "msrvtt_qa_train.jsonl",
            "test": "msrvtt_qa_test.jsonl",
            "val": "msrvtt_qa_val.jsonl",
        }
        raw = load_jsonl(os.path.join(meta_dir, split_files[self.split]))
        if self.subsample < 1:
            n = int(len(raw) * self.subsample)
            random.shuffle(raw)
            raw = raw[:n]
        self.metadata = [
            dict(
                question=d["question"],
                vid_id=d["video_id"],
                answer=d["answer"],
                question_id=qid,
                answer_type=d["answer_type"],
            )
            for qid, d in enumerate(raw)
        ]
        self.num_labels = len(self.ans2label)
        self.label2ans = {v: k for k, v in self.ans2label.items()}
        self.qid2data = {d["question_id"]: d for d in self.metadata}

    def _object_path(self, index: int) -> str:
        return os.path.join(self.object_dir, self.metadata[index]["vid_id"])

    def _text(self, index: int, rng) -> str:
        return self.metadata[index]["question"]

    def _extras(self, index: int) -> Dict[str, Any]:
        d = self.metadata[index]
        label = self.ans2label[d["answer"]] if self.split == "train" else -1
        return {"label": label, "question_id": d["question_id"]}


class MSRVTTMCObjectSelect(RegionDataset):
    def _load_metadata(self):
        raw = load_jsonl(os.path.join(meta_data_dir(), "msrvtt_mc_test.jsonl"))
        if self.subsample < 1:
            n = int(len(raw) * self.subsample)
            random.shuffle(raw)
            raw = raw[:n]
        self.metadata = [
            dict(
                id=d["qid"],
                vid_id=d["clip_name"],
                answer=d["answer"],
                options=d["options"],
            )
            for d in raw
        ]
        self.id2answer = {d["id"]: int(d["answer"]) for d in self.metadata}
        self.id2data = {d["id"]: d for d in self.metadata}

    def _object_path(self, index: int) -> str:
        return os.path.join(self.object_dir, self.metadata[index]["vid_id"])

    def _text(self, index: int, rng):
        return self.metadata[index]["options"]

    def _extras(self, index: int) -> Dict[str, Any]:
        d = self.metadata[index]
        return {"label": d["answer"], "mc_id": d["id"]}
