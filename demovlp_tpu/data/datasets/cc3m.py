"""Conceptual Captions 3M adapter — images as 1-frame videos
(reference data_loader/ConceptualCaptions_dataset.py).

Metadata: ./meta_data/cc3m_{training,validation}_success_full.tsv, headerless
"caption\\tid_hash". Regions live in a single npz per image at
{object_dir}/{split}/{zfill7(prefix)[:4]}/{name}_1.npz with a _0.npz fallback.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.datasets.msrvtt import meta_data_dir
from demovlp_tpu.data.regions import read_image_regions


class ConceptualCaptions3MObjectSelect(RegionDataset):
    def _load_metadata(self):
        split_files = {
            "train": "cc3m_training_success_full.tsv",
            "val": "cc3m_validation_success_full.tsv",
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
        name = self.metadata.iloc[index]["vid"]
        pre = name.split("_")[0].zfill(7)
        return os.path.join(self.object_dir, self.split, pre[:4], name + "_1.npz")

    def _text(self, index: int, rng) -> str:
        return self.metadata.iloc[index]["caption"]

    def _load_objects(self, index: int, rng: np.random.Generator):
        path = self._object_path(index)
        if not os.path.exists(path):
            path = path.replace("_1.npz", "_0.npz")
            if not os.path.exists(path):
                return None
        try:
            return read_image_regions(path, self.object_num)
        except Exception:
            return None
