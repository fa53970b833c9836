"""Pallas fused xattn kernel vs the XLA implementation (interpreter mode on
CPU; the compiled path is exercised on real TPU by bench/e2e runs)."""
import numpy as np
import pytest

import jax.numpy as jnp

from demovlp_tpu.ops.xattn import _xattn_score_xla
from demovlp_tpu.ops.pallas_xattn import (
    xattn_score_pallas_interpret,
    _choose_blocks,
    _round_up,
)


def _inputs(ni, nc, r, w, d=32, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(ni, r, d).astype(np.float32)
    lang = rng.randn(nc, w, d).astype(np.float32)
    imask = ((rng.rand(ni, r) > 0.2).astype(np.float32) - 1) * 100
    lmask = ((rng.rand(nc, w) > 0.2).astype(np.float32) - 1) * 100
    return img, lang, imask, lmask


@pytest.mark.parametrize("focal", ["prob", "equal"])
@pytest.mark.parametrize("shape", [(6, 5, 7, 9), (8, 8, 30, 20)])
def test_pallas_xattn_matches_xla(shape, focal):
    ni, nc, r, w = shape
    img, lang, imask, lmask = _inputs(ni, nc, r, w)
    want = np.asarray(
        _xattn_score_xla(
            jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
            20.0, focal,
        )
    )
    got = np.asarray(
        xattn_score_pallas_interpret(
            jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
            20.0, focal,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_choose_blocks_divides():
    for ls, lq in ((128, 128), (256, 128), (128, 256)):
        bc, bq = _choose_blocks(ls, lq, 32, 32)
        assert 32 % bc == 0 and 32 % bq == 0
        assert bq * lq * ls <= 600_000


def test_round_up():
    assert _round_up(99, 128) == 128
    assert _round_up(128, 128) == 128
    assert _round_up(129, 128) == 256


@pytest.mark.parametrize("focal", ["prob", "equal"])
@pytest.mark.parametrize("shape", [(6, 5, 7, 9), (8, 8, 30, 20)])
def test_pallas_xattn_grads_match_xla(shape, focal):
    """The analytic fused Pallas backward must reproduce jax.grad of the XLA
    implementation (random cotangent, ragged masks)."""
    import jax

    ni, nc, r, w = shape
    img, lang, imask, lmask = _inputs(ni, nc, r, w, seed=3)
    gw = jnp.array(np.random.RandomState(5).randn(ni, nc).astype(np.float32))
    imask_j, lmask_j = jnp.array(imask), jnp.array(lmask)

    def loss_xla(im, la):
        return jnp.sum(_xattn_score_xla(im, la, imask_j, lmask_j, 20.0, focal) * gw)

    def loss_pal(im, la):
        return jnp.sum(
            xattn_score_pallas_interpret(im, la, imask_j, lmask_j, 20.0, focal) * gw
        )

    gx_im, gx_la = jax.grad(loss_xla, argnums=(0, 1))(jnp.array(img), jnp.array(lang))
    gp_im, gp_la = jax.grad(loss_pal, argnums=(0, 1))(jnp.array(img), jnp.array(lang))
    assert np.isfinite(np.asarray(gp_im)).all()
    assert np.isfinite(np.asarray(gp_la)).all()
    np.testing.assert_allclose(
        np.asarray(gp_im), np.asarray(gx_im), rtol=1e-3, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(gp_la), np.asarray(gx_la), rtol=1e-3, atol=3e-5
    )


def test_pallas_xattn_multi_jo_output_blocks():
    """Gallery-scale output path: >128 queries engages the dense output
    layout's outer/inner grid split (out_q=128 blocks, one-hot strip
    accumulation) with multiple jo blocks AND a non-multiple-of-128 query
    count (pad + slice). Guards the layout rework that fixed the 64x padded
    tile-array (BENCH_NOTES.md)."""
    ni, nc, r, w = 9, 290, 6, 11
    img, lang, imask, lmask = _inputs(ni, nc, r, w, seed=3)
    want = np.asarray(
        _xattn_score_xla(
            jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
            20.0, "equal",
        )
    )
    got = np.asarray(
        xattn_score_pallas_interpret(
            jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
            20.0, "equal",
        )
    )
    assert got.shape == (ni, nc)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("focal", ["prob", "equal"])
def test_pallas_xattn_bf16_mxu_mode(focal):
    """compute_dtype=bfloat16: bf16 MXU operands/input tiles with f32
    accumulators and f32 VPU stages. Forward must track the f32 XLA result
    to bf16 rounding (~3e-3 at lambda=20 — ~15x tighter than the XLA
    local_dtype=bfloat16 pipeline it replaces), and grads must be finite
    and within bf16 tolerance."""
    import jax

    ni, nc, r, w = 8, 7, 10, 6
    img, lang, imask, lmask = _inputs(ni, nc, r, w)
    want = np.asarray(
        _xattn_score_xla(
            jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
            20.0, focal,
        )
    )
    got = np.asarray(
        xattn_score_pallas_interpret(
            jnp.array(img), jnp.array(lang), jnp.array(imask), jnp.array(lmask),
            20.0, focal, compute_dtype=jnp.bfloat16,
        )
    )
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)

    def loss_p(i, l):
        return jnp.sum(
            xattn_score_pallas_interpret(
                i, l, imask, lmask, 20.0, focal, compute_dtype=jnp.bfloat16
            ) ** 2
        )

    def loss_x(i, l):
        return jnp.sum(
            _xattn_score_xla(i, l, imask, lmask, 20.0, focal) ** 2
        )

    gp = jax.grad(loss_p, (0, 1))(jnp.array(img), jnp.array(lang))
    gx = jax.grad(loss_x, (0, 1))(jnp.array(img), jnp.array(lang))
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / scale < 0.25  # bf16-rounded softmax
