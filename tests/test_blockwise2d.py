import numpy as np

import jax.numpy as jnp

from demovlp_tpu.ops.xattn import xattn_score, xattn_score_blockwise
from demovlp_tpu.parallel import create_mesh, sharded_local_sims


def _inputs(ni=12, nc=10, r=6, w=5, d=16, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(ni, r, d).astype(np.float32)
    lang = rng.randn(nc, w, d).astype(np.float32)
    imask = ((rng.rand(ni, r) > 0.2).astype(np.float32) - 1) * 100
    lmask = ((rng.rand(nc, w) > 0.2).astype(np.float32) - 1) * 100
    return img, lang, imask, lmask


def test_blockwise_2d_matches_dense():
    img, lang, imask, lmask = _inputs()
    dense = xattn_score(
        jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
        20.0, "equal",
    )
    blocked = xattn_score_blockwise(
        jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
        segment=4, cap_segment=5, lambda_softmax=20.0, focal_type="equal",
    )
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(dense), rtol=1e-5, atol=1e-6
    )


def test_sharded_with_caption_padding():
    """cap_segment that doesn't divide n_cap: padded and trimmed."""
    img, lang, imask, lmask = _inputs(ni=16, nc=7)
    mesh = create_mesh()
    got = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=2, cap_segment=4,
        focal_type="equal",
    )
    want = np.asarray(
        xattn_score(
            jnp.array(img), jnp.array(lang), jnp.array(imask),
            jnp.array(lmask), 20.0, "equal",
        )
    )
    assert got.shape == (16, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_chunked_gallery_matches_dense():
    """Host-level gallery chunking (the >2 GiB-buffer workaround for huge
    galleries): multiple chunks, ragged last chunk, one compiled fn."""
    img, lang, imask, lmask = _inputs(ni=21, nc=9, seed=4)
    mesh = create_mesh()
    got = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=2, focal_type="equal",
        chunk_rows=8,  # 21 rows -> chunks of 8, 8, 5
    )
    want = np.asarray(
        xattn_score(
            jnp.array(img), jnp.array(lang), jnp.array(imask),
            jnp.array(lmask), 20.0, "equal",
        )
    )
    assert got.shape == (21, 9)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_cap_chunked_matches_dense():
    """Caption-axis column chunking (same >2 GiB transfer hazard as the
    gallery axis): ragged last column block, padded to one executable."""
    img, lang, imask, lmask = _inputs(ni=10, nc=19, seed=5)
    mesh = create_mesh()
    got = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=2, focal_type="equal",
        chunk_rows=6, cap_chunk_rows=8,  # both axes chunked, both ragged
    )
    want = np.asarray(
        xattn_score(
            jnp.array(img), jnp.array(lang), jnp.array(imask),
            jnp.array(lmask), 20.0, "equal",
        )
    )
    assert got.shape == (10, 19)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
