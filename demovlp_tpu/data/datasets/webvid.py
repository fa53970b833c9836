"""WebVid adapter (reference data_loader/WebVid_dataset.py).

Metadata: ./meta_data/webvid_{training,validation}_success_full.tsv,
headerless rows "caption\\tpage_dir/videoid". Regions:
{object_dir}/{split}/{page_dir}/{videoid}/{frame}.npz (8 frame files/video).

Note: the reference reads the TSV with a header row, silently consuming the
first data line; we read headerless (one more usable sample).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.datasets.msrvtt import meta_data_dir
from demovlp_tpu.data.sampling import sample_frame_indices


class WebVidObjectSelect(RegionDataset):
    def _load_metadata(self):
        split_files = {
            "train": "webvid_training_success_full.tsv",
            "val": "webvid_validation_success_full.tsv",
            "test": "webvid_validation_success_full.tsv",
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
        rel = self.metadata.iloc[index]["vid"]
        return os.path.join(self.object_dir, self.split, rel)

    def _text(self, index: int, rng) -> str:
        return self.metadata.iloc[index]["caption"]

    def _frame_indices(self, vlen: int, rng: np.random.Generator):
        # fast path: exactly as many stored frames as segments
        # (reference WebVid_dataset.py:95-110)
        if self.segments == vlen:
            return list(range(self.segments))
        if self.split == "train":
            return sample_frame_indices(self.segments, vlen, "rand", rng)
        return sample_frame_indices(self.segments, vlen, "uniform")
