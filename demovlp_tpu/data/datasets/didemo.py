"""DiDeMo adapter (reference data_loader/DiDeMo_dataset.py).

Metadata: ./meta_data/DiDeMo_{train,test}.tsv, headerless
"cap1, cap2, ...\\tvideo_file.mp4". Regions:
{object_dir}/{video_file minus extension}/{frame}.npz.
"""
from __future__ import annotations

import os

import pandas as pd

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.datasets.msrvtt import meta_data_dir


class DiDeMoObjectSelect(RegionDataset):
    def _load_metadata(self):
        split_files = {
            "train": "DiDeMo_train.tsv",
            "val": "DiDeMo_test.tsv",
            "test": "DiDeMo_test.tsv",
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
        rel = self.metadata.iloc[index]["vid"].split(".")[0]
        return os.path.join(self.object_dir, rel)

    def _text(self, index: int, rng) -> str:
        return self.metadata.iloc[index]["caption"]
