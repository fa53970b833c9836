#!/usr/bin/env python
"""Input-pipeline throughput: whole-batch native C++ assembly vs the
per-sample thread-pool path, on a synthetic on-disk npz tree.

Prints one JSON line per mode. Env: LOADER_VIDEOS (64), LOADER_FRAMES (8),
LOADER_K (30), LOADER_BS (16), LOADER_EPOCHS (3).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demovlp_tpu.data.datasets.base import RegionDataset
from demovlp_tpu.data.loader import RegionDataLoader


class _TreeDataset(RegionDataset):
    def _load_metadata(self):
        self.metadata = sorted(
            d for d in os.listdir(self.data_dir)
            if os.path.isdir(os.path.join(self.data_dir, d))
        )

    def _object_path(self, index):
        return os.path.join(self.data_dir, self.metadata[index])

    def _text(self, index, rng):
        return f"caption {index}"


def _make_tree(root: str, n_videos: int, frames: int) -> None:
    rng = np.random.RandomState(0)
    for v in range(n_videos):
        vdir = os.path.join(root, f"v{v:04d}")
        os.makedirs(vdir)
        for i in range(frames):
            n = int(rng.randint(10, 40))
            x1 = rng.uniform(0, 320, n)
            y1 = rng.uniform(0, 240, n)
            np.savez(
                os.path.join(vdir, f"{i}.npz"),
                x=rng.randn(n, 2048).astype(np.float32),
                bbox=np.stack(
                    [x1, y1, x1 + rng.uniform(1, 320, n),
                     y1 + rng.uniform(1, 240, n)], axis=1
                ).astype(np.float32),
                info={
                    "objects_conf": rng.rand(n).astype(np.float32),
                    "objects_id": rng.randint(0, 1600, n),
                    "image_w": 640,
                    "image_h": 480,
                },
            )


def _run(root, n, frames, k, bs, epochs):
    ds = _TreeDataset(
        "tree",
        object_params={"num_frames": frames, "object_num": k},
        data_dir=root,
        split="train",
    )
    loader = RegionDataLoader(
        ds, batch_size=bs, shuffle=True, num_workers=8, drop_last=True,
        process_index=0, process_count=1,
    )
    # warm the page cache + native lib
    for _ in loader:
        pass
    t0 = time.perf_counter()
    count = 0
    for ep in range(epochs):
        loader.set_epoch(ep)
        for batch in loader:
            count += batch["object"].shape[0]
    dt = time.perf_counter() - t0
    return count / dt


def main() -> None:
    n = int(os.environ.get("LOADER_VIDEOS", 64))
    frames = int(os.environ.get("LOADER_FRAMES", 8))
    k = int(os.environ.get("LOADER_K", 30))
    bs = int(os.environ.get("LOADER_BS", 16))
    epochs = int(os.environ.get("LOADER_EPOCHS", 3))
    with tempfile.TemporaryDirectory() as root:
        _make_tree(root, n, frames)
        for mode, env in (("native_batch", "1"), ("per_sample", "0")):
            os.environ["DEMOVLP_NATIVE_BATCH"] = env
            vps = _run(root, n, frames, k, bs, epochs)
            print(
                json.dumps(
                    {
                        "metric": f"loader_videos_per_sec_{mode}",
                        "value": round(vps, 1),
                        "unit": f"videos/s ({frames}f x {k}r, bs={bs})",
                        "vs_baseline": 1.0,
                    }
                )
            )


if __name__ == "__main__":
    main()
