"""Adversarial-input matrix for the C++ npz reader (VERDICT round 3 #5).

The native decoder parses untrusted bytes in-process
(native/npz_region_reader.cc: zip container, raw deflate, NPY headers, a
pickle-VM subset for the info dict). Every corruption below must produce a
nonzero per-file status — never a crash, hang, or over-read — and the
loader-level contract must hold: the row falls back to the numpy path
(data/native.py read_video_regions_auto), which either loads the file
(cases the native reader merely refuses) or raises so the dataset-level
resample takes over (genuinely corrupt files). The reference's behavior
under the same corruption is a silent python-side resample
(MSRVTT_dataset.py:129-157) — this pins a stronger contract.
"""
from __future__ import annotations

import io
import os
import struct
import zipfile
import zlib

import numpy as np
import pytest

from demovlp_tpu.data.native import get_native_reader, read_video_regions_auto
from demovlp_tpu.data.regions import REGION_DIM, read_video_regions

needs_native = pytest.mark.skipif(
    get_native_reader() is None, reason="native reader unavailable (no g++/zlib)"
)

K = 7  # object_num used throughout


# ------------------------------------------------------------- fixtures
def _frame_arrays(n=12, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 2048).astype(np.float32)
    x1 = rng.uniform(0, 320, n)
    y1 = rng.uniform(0, 240, n)
    bbox = np.stack(
        [x1, y1, x1 + rng.uniform(1, 320, n), y1 + rng.uniform(1, 240, n)],
        axis=1,
    ).astype(np.float32)
    info = {
        "objects_conf": rng.rand(n).astype(np.float32),
        "objects_id": rng.randint(0, 1600, n),
        "image_w": 640,
        "image_h": 480,
    }
    return x, bbox, info


def _valid_npz_bytes(compressed=False, seed=0) -> bytes:
    x, bbox, info = _frame_arrays(seed=seed)
    buf = io.BytesIO()
    (np.savez_compressed if compressed else np.savez)(
        buf, x=x, bbox=bbox, info=info
    )
    return buf.getvalue()


def _npy_bytes(arr) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=True)
    return buf.getvalue()


def _zip_of(entries: dict) -> bytes:
    """Stored (uncompressed) zip of raw member bytes — lets tests craft
    arbitrary NPY/pickle payloads behind a structurally valid container."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in entries.items():
            z.writestr(name, data)
    return buf.getvalue()


def _valid_members(seed=0) -> dict:
    x, bbox, info = _frame_arrays(seed=seed)
    return {
        "x.npy": _npy_bytes(x),
        "bbox.npy": _npy_bytes(bbox),
        "info.npy": _npy_bytes(np.array(info, dtype=object)),
    }


def _decode_bytes(tmp_path, blob: bytes):
    """Write blob as a frame file and decode it natively.
    Returns (status_code, feat, mask, lens, path)."""
    reader = get_native_reader()
    path = tmp_path / "0.npz"
    path.write_bytes(blob)
    feat = np.zeros((1, K, REGION_DIM), np.float32)
    mask = np.zeros((1, K), np.float32)
    lens = np.zeros(1, np.int32)
    status = reader.read_paths_into([str(path)], K, feat, mask, lens)
    return int(status[0]), feat, mask, lens, str(path)


def _numpy_loads(path) -> bool:
    """Does the np.load fallback pipeline accept this file?"""
    try:
        read_video_regions(os.path.dirname(path), [0], K)
        return True
    except Exception:
        return False


# ------------------------------------------ container-level corruptions
def _truncated(frac):
    def make(blob):
        return blob[: max(1, int(len(blob) * frac))]
    return make


def _flip_eocd_magic(blob):
    i = blob.rfind(b"PK\x05\x06")
    assert i >= 0
    return blob[:i] + b"XX" + blob[i + 2:]


def _flip_central_magic(blob):
    i = blob.rfind(b"PK\x01\x02")
    assert i >= 0
    return blob[:i] + b"XX" + blob[i + 2:]


def _flip_local_magic(blob):
    i = blob.find(b"PK\x03\x04")
    assert i == 0
    return b"XX" + blob[2:]


def _eocd_offset(blob) -> int:
    i = blob.rfind(b"PK\x05\x06")
    assert i >= 0
    return i


def _first_cd_offset(blob) -> int:
    i = blob.find(b"PK\x01\x02")
    assert i >= 0
    return i


def _patch_u32(blob, off, value):
    return blob[:off] + struct.pack("<I", value) + blob[off + 4:]


def _oversized_comp_size(blob):
    """First CD entry claims comp_size far past the buffer end."""
    cd = _first_cd_offset(blob)
    return _patch_u32(blob, cd + 20, 0x7FFFFFFF)


def _huge_uncomp_size(blob):
    """Compressed member claims a multi-GiB uncompressed size (alloc-bomb)."""
    cd = _first_cd_offset(blob)
    return _patch_u32(blob, cd + 24, 0xFFFFFF00)


def _cd_offset_past_end(blob):
    """EOCD points the central directory past the end of the file."""
    e = _eocd_offset(blob)
    return _patch_u32(blob, e + 16, len(blob) + 1000)


def _corrupt_deflate_stream(blob):
    """Flip bytes in the middle of the first compressed member's data."""
    name_len, extra_len = struct.unpack("<HH", blob[26:30])
    data_off = 30 + name_len + extra_len
    i = data_off + 40
    bad = bytes(b ^ 0xFF for b in blob[i : i + 8])
    return blob[:i] + bad + blob[i + 8:]


def _bad_crc_stored(blob):
    """Flip payload bytes of a STORED member without touching sizes: both
    the native reader (CRC) and zipfile (CRC) must reject silent bit-rot."""
    name_len, extra_len = struct.unpack("<HH", blob[26:30])
    data_off = 30 + name_len + extra_len
    i = data_off + 200  # inside x.npy's float payload
    bad = bytes(b ^ 0xFF for b in blob[i : i + 4])
    return blob[:i] + bad + blob[i + 4:]


CONTAINER_CASES = [
    ("empty", lambda blob: b""),
    ("one_byte", lambda blob: b"P"),
    ("garbage", lambda blob: bytes(range(256)) * 40),
    ("trunc_25", _truncated(0.25)),
    ("trunc_60", _truncated(0.60)),
    ("trunc_95", _truncated(0.95)),
    ("trunc_last_byte", lambda blob: blob[:-1]),
    ("eocd_magic", _flip_eocd_magic),
    ("central_magic", _flip_central_magic),
    ("local_magic", _flip_local_magic),
    ("comp_size_oob", _oversized_comp_size),
    ("cd_offset_oob", _cd_offset_past_end),
    ("bad_crc_stored", _bad_crc_stored),
]


@needs_native
@pytest.mark.parametrize("name,corrupt", CONTAINER_CASES,
                         ids=[c[0] for c in CONTAINER_CASES])
def test_container_corruption_rejected(tmp_path, name, corrupt):
    blob = _valid_npz_bytes(compressed=False)
    rc, _, _, _, path = _decode_bytes(tmp_path, corrupt(blob))
    assert rc != 0, name
    # every container corruption also breaks the zipfile/np.load fallback,
    # so the dataset-level resample is what the user sees — same contract
    assert not _numpy_loads(path), name


@needs_native
def test_corrupt_deflate_stream_rejected(tmp_path):
    blob = _valid_npz_bytes(compressed=True)
    rc, _, _, _, path = _decode_bytes(tmp_path, _corrupt_deflate_stream(blob))
    assert rc != 0
    assert not _numpy_loads(path)


@needs_native
def test_alloc_bomb_uncomp_size_rejected(tmp_path):
    """A 4-GiB uncomp_size claim must be refused, not allocated."""
    blob = _valid_npz_bytes(compressed=True)
    rc, _, _, _, _ = _decode_bytes(tmp_path, _huge_uncomp_size(blob))
    assert rc != 0


@needs_native
def test_missing_member_rejected(tmp_path):
    m = _valid_members()
    del m["info.npy"]
    rc, _, _, _, path = _decode_bytes(tmp_path, _zip_of(m))
    # native: E_SCHEMA; numpy fallback: KeyError in the pipeline
    assert rc != 0
    assert not _numpy_loads(path)


# ------------------------------------------------- NPY-level corruptions
def _with_x(x_bytes: bytes) -> bytes:
    m = _valid_members()
    m["x.npy"] = x_bytes
    return _zip_of(m)


def _patched_header(npy: bytes, old: bytes, new: bytes) -> bytes:
    """Replace `old` with same-length `new` inside the NPY header text."""
    assert len(old) == len(new)
    i = npy.index(old)
    return npy[:i] + new + npy[i + len(old):]


@needs_native
def test_npy_bad_magic(tmp_path):
    x = _npy_bytes(np.zeros((3, 2048), np.float32))
    rc, _, _, _, path = _decode_bytes(tmp_path, _with_x(b"XXXXXX" + x[6:]))
    assert rc != 0
    assert not _numpy_loads(path)


@needs_native
def test_npy_bad_version(tmp_path):
    x = _npy_bytes(np.zeros((3, 2048), np.float32))
    rc, _, _, _, _ = _decode_bytes(
        tmp_path, _with_x(x[:6] + b"\x09\x00" + x[8:])
    )
    assert rc != 0


@needs_native
def test_npy_truncated_v2_header(tmp_path):
    """A v2 magic with only 10 bytes total: the 4-byte header-length field
    would read past the allocation without the explicit n>=12 check."""
    rc, _, _, _, _ = _decode_bytes(
        tmp_path, _with_x(b"\x93NUMPY\x02\x00\xff\xff")
    )
    assert rc != 0


@needs_native
def test_npy_negative_dim(tmp_path):
    x = _npy_bytes(np.zeros((13, 2048), np.float32))
    bad = _patched_header(x, b"(13, 2048)", b"(-3, 2048)")
    rc, _, _, _, path = _decode_bytes(tmp_path, _with_x(bad))
    assert rc != 0
    assert not _numpy_loads(path)


def _crafted_npy(descr: bytes, shape: bytes, payload: bytes) -> bytes:
    """Hand-built v1 NPY with an arbitrary header (numpy can't be asked to
    produce over-claiming shapes)."""
    header = (
        b"{'descr': '" + descr + b"', 'fortran_order': False, "
        b"'shape': " + shape + b", }"
    )
    pad = (64 - (10 + len(header) + 1) % 64) % 64
    header = header + b" " * pad + b"\n"
    return (
        b"\x93NUMPY\x01\x00" + struct.pack("<H", len(header)) + header
        + payload
    )


@needs_native
def test_npy_oversized_dims(tmp_path):
    """Shape claims far more elements than the payload holds: must be
    refused before any allocation is sized off the claim."""
    bad = _crafted_npy(b"<f4", b"(99999999, 2048)", b"\x00" * 64)
    rc, _, _, _, _ = _decode_bytes(tmp_path, _with_x(bad))
    assert rc != 0


@needs_native
def test_npy_overflowing_dims(tmp_path):
    """Dims whose product overflows int64 must not wrap to a small or
    negative element count."""
    bad = _crafted_npy(
        b"<f4", b"(4000000000, 4000000000, 4000000000)", b"\x00" * 16
    )
    rc, _, _, _, _ = _decode_bytes(tmp_path, _with_x(bad))
    assert rc != 0


@needs_native
def test_npy_fortran_order_refused_numpy_fallback_loads(tmp_path):
    """fortran_order=True is OUT OF SCOPE for the native reader (refuse),
    but it is a VALID file — the numpy fallback must load it and produce
    the standard pipeline result."""
    x, bbox, info = _frame_arrays()
    m = _valid_members()
    m["x.npy"] = _npy_bytes(np.asfortranarray(x))
    rc, _, _, _, path = _decode_bytes(tmp_path, _zip_of(m))
    assert rc != 0
    assert _numpy_loads(path)
    feat, mask, lens = read_video_regions_auto(
        os.path.dirname(path), [0], K
    )
    want = read_video_regions(os.path.dirname(path), [0], K)
    np.testing.assert_array_equal(feat, want[0])


@needs_native
def test_npy_wrong_feat_dim(tmp_path):
    m = _valid_members()
    m["x.npy"] = _npy_bytes(np.zeros((5, 100), np.float32))
    rc, _, _, _, _ = _decode_bytes(tmp_path, _zip_of(m))
    assert rc != 0  # E_SCHEMA: x must be (N, 2048)


# ---------------------------------------------- pickle-level corruptions
def _with_info(pickle_payload: bytes) -> bytes:
    """Wrap raw pickle bytes in an object-array NPY inside the npz."""
    header = b"{'descr': '|O', 'fortran_order': False, 'shape': (), }"
    pad = (64 - (10 + len(header) + 1) % 64) % 64
    header = header + b" " * pad + b"\n"
    npy = b"\x93NUMPY\x01\x00" + struct.pack("<H", len(header)) + header
    npy += pickle_payload
    m = _valid_members()
    m["info.npy"] = npy
    return _zip_of(m)


PICKLE_CASES = [
    # out-of-subset opcode (0x81 NEWOBJ is not in the supported set)
    ("forbidden_opcode", b"\x80\x04\x81."),
    # stack underflow: TUPLE1 with nothing on the stack
    ("underflow_tuple1", b"\x80\x04\x85."),
    # stack underflow: SETITEM on empty stack
    ("underflow_setitem", b"\x80\x04s."),
    # stack underflow: REDUCE on empty stack
    ("underflow_reduce", b"\x80\x04R."),
    # APPENDS with mark at 0 (indexes stack[-1])
    ("appends_mark_zero", b"\x80\x04(e."),
    # BUILD on empty stack
    ("underflow_build", b"\x80\x04b."),
    # MEMOIZE on empty stack
    ("underflow_memoize", b"\x80\x04\x94."),
    # LONG_BINPUT with a huge memo index (memo-table alloc bomb)
    ("memo_bomb", b"\x80\x04N r\xff\xff\xff\xff."),
    # truncated mid-opcode: BINUNICODE claims more bytes than remain
    ("trunc_binunicode", b"\x80\x04X\xff\x00\x00\x00ab"),
    # no STOP opcode
    ("no_stop", b"\x80\x04N"),
    # BINGET of an unset memo slot
    ("unset_memo_get", b"\x80\x04h\x10."),
    # memo RATCHET: a stream of LONG_BINPUTs whose indices each step up by
    # ~1k — a per-opcode relative cap admits every step while the table
    # ratchets toward GBs; the total-puts bound must reject it immediately
    ("memo_ratchet", b"\x80\x04" + b"".join(
        b"N" + b"r" + struct.pack("<I", (i + 1) * 1000) + b"0"
        for i in range(200)
    ) + b"N."),
]


@needs_native
@pytest.mark.parametrize("name,payload", PICKLE_CASES,
                         ids=[c[0] for c in PICKLE_CASES])
def test_pickle_corruption_rejected(tmp_path, name, payload):
    rc, _, _, _, _ = _decode_bytes(tmp_path, _with_info(payload))
    assert rc != 0, name


@needs_native
def test_info_missing_keys_rejected(tmp_path):
    m = _valid_members()
    m["info.npy"] = _npy_bytes(np.array({"unrelated": 1}, dtype=object))
    rc, _, _, _, _ = _decode_bytes(tmp_path, _zip_of(m))
    assert rc != 0  # E_SCHEMA: objects_conf/image_w/image_h required


@needs_native
def test_conf_length_mismatch_rejected(tmp_path):
    x, bbox, info = _frame_arrays(n=12)
    info["objects_conf"] = info["objects_conf"][:5]
    m = _valid_members()
    m["info.npy"] = _npy_bytes(np.array(info, dtype=object))
    rc, _, _, _, _ = _decode_bytes(tmp_path, _zip_of(m))
    assert rc != 0  # conf length must equal the region count


# --------------------------------------------------------------- fuzzing
@needs_native
@pytest.mark.parametrize("compressed", [False, True])
def test_byte_flip_fuzz(tmp_path, compressed):
    """300 random 1-4-byte flips over a valid file: the reader must never
    crash; when BOTH the native reader and np.load accept a mutant, their
    outputs must still be bit-identical (the parity contract holds even on
    mutated-but-parseable bytes)."""
    blob = bytearray(_valid_npz_bytes(compressed=compressed))
    rng = np.random.RandomState(1234)
    reader = get_native_reader()
    n_ok = n_err = 0
    for trial in range(300):
        mutant = bytearray(blob)
        for _ in range(int(rng.randint(1, 5))):
            mutant[int(rng.randint(len(mutant)))] = int(rng.randint(256))
        path = tmp_path / "0.npz"
        path.write_bytes(bytes(mutant))
        feat = np.zeros((1, K, REGION_DIM), np.float32)
        mask = np.zeros((1, K), np.float32)
        lens = np.zeros(1, np.int32)
        status = reader.read_paths_into([str(path)], K, feat, mask, lens)
        if status[0] == 0:
            n_ok += 1
            if _numpy_loads(str(path)):
                want = read_video_regions(str(tmp_path), [0], K)
                np.testing.assert_array_equal(feat[0], want[0][0])
                np.testing.assert_array_equal(mask[0], want[1][0])
        else:
            n_err += 1
    # the matrix only proves anything if both branches were exercised
    assert n_err > 0
