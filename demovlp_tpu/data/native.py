"""ctypes binding for the native C++ npz region decoder (native/
npz_region_reader.cc) with compile-on-first-use and a transparent numpy
fallback.

Usage: `reader = get_native_reader()`; `reader.read_video(dir, idxs, k)` has
the same contract as demovlp_tpu.data.regions.read_video_regions. Datasets
pick it up automatically when DEMOVLP_NATIVE=1 (or it has been built).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from demovlp_tpu.data.regions import REGION_DIM, read_video_regions

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "npz_region_reader.cc"
_LIB = _SRC.parent / "libregionreader.so"

_reader = None
_reader_failed = False


def build_library(force: bool = False) -> Optional[Path]:
    """Compile the shared library with g++ (no external build system).

    Rebuilds when the source is newer than the cached .so, so a source
    update is never served by a stale library.
    """
    if (
        _LIB.exists()
        and not force
        and (not _SRC.exists() or _LIB.stat().st_mtime >= _SRC.stat().st_mtime)
    ):
        return _LIB
    if not _SRC.exists():
        return None
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB), "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _LIB
    except Exception:
        return None


class NativeRegionReader:
    """Thin wrapper over the C API; raises on unusable files so callers can
    fall back per-sample."""

    def __init__(self, lib_path: Path, n_threads: Optional[int] = None):
        self.lib = ctypes.CDLL(str(lib_path))
        self.lib.demovlp_read_frames.restype = ctypes.c_int
        self.lib.demovlp_read_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        self.lib.demovlp_region_dim.restype = ctypes.c_int
        assert self.lib.demovlp_region_dim() == REGION_DIM
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)

    def read_paths_into(
        self, paths: Sequence[str], object_num: int,
        feat: np.ndarray, mask: np.ndarray, lens: np.ndarray,
    ) -> np.ndarray:
        """Decode npz files straight into caller-owned contiguous buffers
        (feat (N,K,2054) f32, mask (N,K) f32, lens (N,) i32). Returns the
        per-file status array (0 = ok) WITHOUT raising — batch assembly
        falls back per-row on the rare corrupt file."""
        f = len(paths)
        status = np.zeros(f, dtype=np.int32)
        if f == 0 or object_num <= 0:
            # argument-level failures return from C before any per-file
            # status is written — an all-zero status would read as success
            raise ValueError(f"read_paths_into: n_paths={f}, K={object_num}")
        arr = (ctypes.c_char_p * f)(*[p.encode() for p in paths])
        rc = self.lib.demovlp_read_frames(
            arr, f, object_num, self.n_threads,
            feat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0 and not status.any():
            raise ValueError(f"native decode arg failure rc={rc}")
        return status

    def read_paths(self, paths: Sequence[str], object_num: int):
        """Decode frame npz files -> (feat (F,K,2054), mask (F,K), lens)."""
        f = len(paths)
        feat = np.zeros((f, object_num, REGION_DIM), dtype=np.float32)
        mask = np.zeros((f, object_num), dtype=np.float32)
        lens = np.zeros(f, dtype=np.int32)
        status = self.read_paths_into(paths, object_num, feat, mask, lens)
        if status.any():
            raise IOError(f"native decode failed status={status.tolist()}")
        return feat, mask, lens.tolist()

    def read_video(self, object_dir: str, frame_idxs: Sequence[int], object_num: int):
        paths = [os.path.join(object_dir, f"{i}.npz") for i in frame_idxs]
        return self.read_paths(paths, object_num)


def get_native_reader() -> Optional[NativeRegionReader]:
    """Singleton native reader, or None if it can't be built/loaded.
    DEMOVLP_NATIVE_LIB points at a prebuilt .so (e.g. the sanitized build
    used by scripts/asan_check_native.py) instead of the standard one."""
    global _reader, _reader_failed
    if _reader is not None:
        return _reader
    if _reader_failed:
        return None
    override = os.environ.get("DEMOVLP_NATIVE_LIB")
    lib = Path(override) if override else build_library()
    if lib is not None and not Path(lib).exists():
        lib = None
    if lib is None:
        _reader_failed = True
        return None
    try:
        _reader = NativeRegionReader(lib)
    except Exception:
        _reader_failed = True
        return None
    return _reader


def read_video_regions_auto(object_dir: str, frame_idxs, object_num: int):
    """Native decode when available, per-call numpy fallback otherwise."""
    if os.environ.get("DEMOVLP_NATIVE", "1") != "0":
        reader = get_native_reader()
        if reader is not None:
            try:
                return reader.read_video(object_dir, frame_idxs, object_num)
            except Exception:
                pass
    return read_video_regions(object_dir, frame_idxs, object_num)
