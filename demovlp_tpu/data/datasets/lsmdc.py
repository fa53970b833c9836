"""LSMDC retrieval + multiple-choice adapters
(reference data_loader/LSMDC_dataset.py).

Metadata lives INSIDE data_dir ({data_dir}/meta_data/LSMDC16_*.csv, tab-sep).
Clip paths are reconstructed from clip names: "Movie_XYZ_clipid" ->
"Movie_XYZ/" + full clip name (the trailing _segment is the per-movie dir).
MC: options are csv columns 5..9; answer column is 1-indexed -> -1.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import pandas as pd

from demovlp_tpu.data.datasets.base import RegionDataset


def _movie_rel_path(video_fp: str) -> str:
    sub_path = video_fp.split(".")[0]
    tail = sub_path.split("_")[-1]
    movie_dir = sub_path.replace("_" + tail, "/")
    return movie_dir + video_fp


class LSMDCObjectSelect(RegionDataset):
    def _load_metadata(self):
        meta_dir = os.path.join(self.data_dir, "meta_data")
        split_files = {
            "train": "LSMDC16_annos_training.csv",
            "val": "LSMDC16_challenge_1000_publictect.csv",
            "test": "LSMDC16_challenge_1000_publictect.csv",
        }
        metadata = pd.read_csv(
            os.path.join(meta_dir, split_files[self.split]), sep="\t", header=None
        )
        if self.subsample < 1:
            metadata = metadata.sample(frac=self.subsample)
        self.metadata = metadata

    def _object_path(self, index: int) -> str:
        video_fp = self.metadata.iloc[index, 0]
        return os.path.join(self.object_dir, _movie_rel_path(video_fp))

    def _text(self, index: int, rng) -> str:
        return self.metadata.iloc[index, -1]


class LSMDCMCObjectSelect(RegionDataset):
    def _load_metadata(self):
        meta_dir = os.path.join(self.data_dir, "meta_data")
        split_files = {
            "train": "LSMDC16_multiple_choice_train.csv",
            "val": "LSMDC16_multiple_choice_test_randomized.csv",
            "test": "LSMDC16_multiple_choice_test_randomized.csv",
        }
        metadata = pd.read_csv(
            os.path.join(meta_dir, split_files[self.split]), sep="\t", header=None
        )
        if self.subsample < 1:
            metadata = metadata.sample(frac=self.subsample)

        datalist = []
        for i in range(len(metadata)):
            row = metadata.iloc[i]
            video_fp = row.iloc[0]
            options = [row.iloc[idx] for idx in range(5, 10)]
            answer = int(row.iloc[-1]) - 1 if self.split in ("val", "test") else 0
            datalist.append(
                dict(
                    id=video_fp,
                    vid_id=_movie_rel_path(video_fp) + ".avi",
                    answer=answer,
                    options=options,
                )
            )
        self.metadata = datalist
        self.id2answer = {d["id"]: int(d["answer"]) for d in self.metadata}
        self.id2data = {d["id"]: d for d in self.metadata}

    def _object_path(self, index: int) -> str:
        return os.path.join(
            self.object_dir, _movie_rel_path(self.metadata[index]["id"])
        )

    def _text(self, index: int, rng):
        return self.metadata[index]["options"]

    def _extras(self, index: int) -> Dict[str, Any]:
        d = self.metadata[index]
        return {"label": d["answer"], "mc_id": d["id"]}
