"""Abstract region dataset.

Spec: reference base/base_dataset.py (env-var expansion of dirs :32-34,
frame sampling :82-101) plus the per-dataset __getitem__ skeleton
(MSRVTT_dataset.py:124-170): existence check on {dir}/0.npz, <2 frame files
=> pick another sample, rand (train) / midpoint (eval) frame sampling, and
the shared top-K region pipeline. Bad samples are swapped for a random other
item like the reference, but with a bounded retry count and an explicit
counter (self.resample_count) instead of unbounded recursion.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from demovlp_tpu.data.native import read_video_regions_auto
from demovlp_tpu.data.sampling import sample_frame_indices

_MAX_RETRIES = 20


class RegionDataset:
    def __init__(
        self,
        dataset_name: str,
        text_params: Optional[dict] = None,
        object_params: Optional[dict] = None,
        data_dir: str = "",
        object_dir: str = "",
        metadata_dir: Optional[str] = None,
        split: str = "train",
        tsfms=None,
        cut: Optional[str] = None,
        subsample: float = 1,
        sliding_window_stride: int = -1,
        reader: str = "cv2",
        mask: bool = False,
        seed: int = 0,
    ):
        self.dataset_name = dataset_name
        self.text_params = text_params or {}
        self.object_params = object_params or {}
        self.data_dir = os.path.expandvars(data_dir)
        self.object_dir = os.path.expandvars(object_dir)
        self.metadata_dir = (
            os.path.expandvars(metadata_dir) if metadata_dir is not None else self.data_dir
        )
        self.split = split
        self.transforms = tsfms
        self.cut = cut
        self.subsample = subsample
        self.sliding_window_stride = sliding_window_stride
        self.reader = reader
        self.mask = mask
        self.segments = int(self.object_params.get("num_frames", 4))
        self.object_num = int(self.object_params.get("object_num", 20))
        self.seed = seed
        self.resample_count = 0
        self.label_type = "caption"
        self._load_metadata()

    # ---- subclass hooks -------------------------------------------------
    def _load_metadata(self):
        raise NotImplementedError

    def _num_samples(self) -> int:
        return len(self.metadata)

    def _object_path(self, index: int) -> str:
        """Absolute path of the per-video region directory (or file)."""
        raise NotImplementedError

    def _text(self, index: int, rng: np.random.Generator):
        """Caption / question / options for the sample."""
        raise NotImplementedError

    def _extras(self, index: int) -> Dict[str, Any]:
        """Task-specific fields (label, question_id, mc_id...)."""
        return {}

    # ---- shared mechanics ------------------------------------------------
    def __len__(self) -> int:
        return self._num_samples()

    def text_lengths(self) -> np.ndarray:
        """Approximate per-sample caption lengths (whitespace word counts),
        consumed by length-grouped batching (data/loader.py). A PROXY only:
        grouping never changes sample content, just which samples share a
        batch, so a dataset whose `_text` draws a random caption per fetch
        may return a different (correlated-length) caption later — harmless.
        Pure metadata reads; no region IO. Cached on the instance (the
        -fast pre-train config builds TWO train loaders over each dataset)
        and vectorized over the metadata caption column when one exists —
        the per-sample `_text` loop pays an iloc per row, a multi-minute
        serial startup stall at CC3M scale (~3M captions)."""
        cached = getattr(self, "_text_lens_cache", None)
        if cached is not None:
            return cached
        lens = self._vectorized_text_lengths()
        if lens is None:
            rng = np.random.default_rng(0)
            lens = np.empty(len(self), dtype=np.int32)
            for i in range(len(self)):
                t = self._text(i, rng)
                if isinstance(t, (list, tuple)):
                    t = max((str(x) for x in t), key=len, default="")
                lens[i] = len(str(t).split())
        self._text_lens_cache = lens
        return lens

    def _vectorized_text_lengths(self) -> Optional[np.ndarray]:
        """Pandas-vectorized word counts when the metadata frame carries one
        plain-string caption per sample; None -> caller falls back to the
        per-sample `_text` loop (list-valued captions, generated text, or a
        metadata/sample-count mismatch)."""
        md = getattr(self, "metadata", None)
        if (
            md is None
            or not hasattr(md, "columns")
            or "caption" not in getattr(md, "columns", ())
            or len(md) != len(self)
        ):
            return None
        col = md["caption"]
        if not col.map(lambda t: isinstance(t, str)).all():
            return None
        return col.str.split().str.len().to_numpy(np.int32)

    def _frame_indices(self, vlen: int, rng: np.random.Generator):
        if self.split == "train":
            idxs = sample_frame_indices(self.segments, vlen, "rand", rng)
        else:
            idxs = sample_frame_indices(self.segments, vlen, "uniform")
        # vlen < num_frames yields fewer indices (sampling.py acc_samples =
        # min(segments, vlen)); fixed batch shapes need exactly `segments`
        # frames, so repeat the last one. Documented deviation: the
        # reference instead raises inside random.choice and silently swaps
        # the whole sample (MSRVTT_dataset.py:152-157).
        while len(idxs) < self.segments:
            idxs.append(idxs[-1])
        return idxs

    def _load_objects(self, index: int, rng: np.random.Generator):
        """Returns (object, mask, lens) or None if the sample is unreadable."""
        object_fp = self._object_path(index)
        if not os.path.exists(os.path.join(object_fp, "0.npz")):
            return None
        vlen = len(os.listdir(object_fp))
        if vlen < 2:
            return None
        try:
            frame_idxs = self._frame_indices(vlen, rng)
            # native C++ decoder when built (10x the numpy path), else numpy
            return read_video_regions_auto(object_fp, frame_idxs, self.object_num)
        except Exception:
            return None

    def __getitem__(self, item: int) -> Dict[str, Any]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, item & 0x7FFFFFFF])
        )
        return self.get_item(item, rng)

    # ---- batch-assembly fast path ---------------------------------------
    def plan_paths(self, item: int, rng: np.random.Generator):
        """Frame npz paths for `item`, or None if unreadable (caller
        resamples). Consumes `rng` exactly like `_load_objects` (frame
        sampling first) so batched and per-sample decoding produce
        IDENTICAL samples. Only valid for datasets using the base
        `_load_objects` (the loader checks)."""
        object_fp = self._object_path(item)
        if not os.path.exists(os.path.join(object_fp, "0.npz")):
            return None
        vlen = len(os.listdir(object_fp))
        if vlen < 2:
            return None
        frame_idxs = self._frame_indices(vlen, rng)
        return [os.path.join(object_fp, f"{i}.npz") for i in frame_idxs]

    def plan_item(self, item: int, rng: np.random.Generator):
        """(paths, non-object fields) mirroring get_item's resample loop —
        the object decode itself happens later in one native batch call
        (data/loader.py). Decode failures surface per-row there and fall
        back to get_item."""
        item = item % len(self)
        for _ in range(_MAX_RETRIES):
            paths = self.plan_paths(item, rng)
            if paths is not None:
                break
            self.resample_count += 1
            item = int(rng.integers(0, len(self)))
        else:
            raise RuntimeError(
                f"{self.dataset_name}: no readable sample after {_MAX_RETRIES} tries"
            )
        text = self._text(item, rng)
        data = {
            "text": text,
            "meta": self._meta(item, text),
        }
        data.update(self._extras(item))
        return paths, data

    def _meta(self, item: int, text) -> Dict[str, Any]:
        """Per-sample meta, shared by get_item and the plan_item fast path.
        Reference datasets expose the raw caption in meta
        (e.g. MSRVTT_dataset.py:159) — the visualizer and the serving index
        read it. MC datasets return the options LIST from _text; meta keeps
        the reference's raw-caption-STRING convention (base_dataset.py:130)
        so the serving index never stores a Python-repr'd list — the
        canonical caption is the first (ground-truth-ordered) option."""
        raw_caption = (
            text[0] if isinstance(text, (list, tuple)) and text else text
        )
        return {
            "paths": self._object_path(item),
            "raw_captions": raw_caption,
            "dataset": self.dataset_name,
        }

    def get_item(self, item: int, rng: np.random.Generator) -> Dict[str, Any]:
        item = item % len(self)
        for _ in range(_MAX_RETRIES):
            loaded = self._load_objects(item, rng)
            if loaded is not None:
                break
            # reference behavior: silently substitute a random other sample
            self.resample_count += 1
            item = int(rng.integers(0, len(self)))
        else:
            raise RuntimeError(
                f"{self.dataset_name}: no readable sample after {_MAX_RETRIES} tries"
            )
        obj, obj_mask, obj_len = loaded
        text = self._text(item, rng)
        data = {
            "object": obj,
            "object_mask": obj_mask,
            "object_len": obj_len,
            "text": text,
            "meta": self._meta(item, text),
        }
        data.update(self._extras(item))
        return data
