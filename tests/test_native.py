"""Native C++ npz decoder vs the numpy pipeline (bit-exact contract)."""
import os

import numpy as np
import pytest

from demovlp_tpu.data.native import get_native_reader, read_video_regions_auto
from demovlp_tpu.data.regions import read_video_regions


def _make_video(tmp_path, n_frames=4, seed=0, compressed=False):
    rng = np.random.RandomState(seed)
    vdir = tmp_path / "vid"
    vdir.mkdir(exist_ok=True)
    save = np.savez_compressed if compressed else np.savez
    for i in range(n_frames):
        n = int(rng.randint(3, 25))
        w, h = 640, 480
        x1 = rng.uniform(0, w / 2, n)
        y1 = rng.uniform(0, h / 2, n)
        bbox = np.stack(
            [x1, y1, x1 + rng.uniform(1, w / 2, n), y1 + rng.uniform(1, h / 2, n)],
            axis=1,
        ).astype(np.float32)
        info = {
            "objects_conf": rng.rand(n).astype(np.float32),
            "objects_id": rng.randint(0, 1600, n),
            "image_w": w,
            "image_h": h,
        }
        save(
            str(vdir / f"{i}.npz"),
            x=rng.randn(n, 2048).astype(np.float32),
            bbox=bbox,
            info=info,
        )
    return str(vdir)


needs_native = pytest.mark.skipif(
    get_native_reader() is None, reason="native reader unavailable (no g++/zlib)"
)


@needs_native
@pytest.mark.parametrize("compressed", [False, True])
def test_native_matches_numpy(tmp_path, compressed):
    vdir = _make_video(tmp_path, compressed=compressed)
    reader = get_native_reader()
    idxs = [0, 1, 3]
    fn, mn, ln = reader.read_video(vdir, idxs, 12)
    fp, mp, lp = read_video_regions(vdir, idxs, 12)
    np.testing.assert_array_equal(fn, fp)
    np.testing.assert_array_equal(mn, mp)
    assert ln == lp


@needs_native
def test_native_error_on_missing(tmp_path):
    reader = get_native_reader()
    with pytest.raises(IOError):
        reader.read_video(str(tmp_path), [0], 5)


def test_auto_fallback(tmp_path):
    vdir = _make_video(tmp_path, seed=1)
    f, m, l = read_video_regions_auto(vdir, [0, 2], 8)
    fp, mp, lp = read_video_regions(vdir, [0, 2], 8)
    np.testing.assert_array_equal(f, fp)
