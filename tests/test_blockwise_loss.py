"""Blockwise RWA loss (differentiable scan) == dense, values and gradients."""
import numpy as np

import jax
import jax.numpy as jnp

from demovlp_tpu.losses.losses import rwa_loss


def _inputs(b=8, r=6, w=5, d=16, seed=0):
    rng = np.random.RandomState(seed)
    im = jnp.array(rng.randn(b, r, d), jnp.float32)
    s = jnp.array(rng.randn(b, w, d), jnp.float32)
    imm = jnp.array(((rng.rand(b, r) > 0.2).astype(np.float32) - 1) * 100)
    sm = jnp.array(((rng.rand(b, w) > 0.2).astype(np.float32) - 1) * 100)
    return im, s, imm, sm


def test_blockwise_rwa_matches_dense_and_grads():
    im, s, imm, sm = _inputs()

    def dense(im, s):
        return rwa_loss(im, s, imm, sm, 20.0, "equal", block_segment=0)

    def blocked(im, s):
        return rwa_loss(im, s, imm, sm, 20.0, "equal", block_segment=2)

    ld, (gd_im, gd_s) = jax.value_and_grad(dense, argnums=(0, 1))(im, s)
    lb, (gb_im, gb_s) = jax.value_and_grad(blocked, argnums=(0, 1))(im, s)
    np.testing.assert_allclose(float(lb), float(ld), rtol=1e-5)
    # grads agree up to fp32 reassociation noise amplified by the focal
    # indicator's hard threshold (H flips on ~1e-7 logit differences)
    np.testing.assert_allclose(np.asarray(gb_im), np.asarray(gd_im),
                               rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_s), np.asarray(gd_s),
                               rtol=2e-2, atol=1e-5)


def test_block_segment_noop_when_not_divisible():
    im, s, imm, sm = _inputs(b=6)
    a = rwa_loss(im, s, imm, sm, 20.0, "equal", block_segment=4)  # 6 % 4 != 0
    b = rwa_loss(im, s, imm, sm, 20.0, "equal", block_segment=0)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
