"""Mask conventions and the shared l2norm.

The whole framework uses the reference's additive-mask convention: a binary
mask (1 = valid, 0 = pad) maps to an additive bias of (mask - 1) * 100,
i.e. 0 for valid and -100 for padded positions (reference
object_transformer.py:421, trainer/trainer_dist.py:159). -100 (not -inf)
is deliberate: the reference relies on "soft" masking, and exact numerical
parity requires the same constant.
"""
from __future__ import annotations

import jax.numpy as jnp

MASK_SCALE = 100.0


def additive_mask(binary_mask, scale: float = MASK_SCALE):
    """(1,0) validity mask -> (0, -scale) additive attention bias."""
    return (binary_mask.astype(jnp.float32) - 1.0) * scale


def l2norm(x, axis=-1, eps: float = 1e-8):
    """L2-normalize along `axis` with the reference's eps-in-denominator form:
    x / (sqrt(sum(x^2)) + eps)   (reference model/loss.py:333-338).

    Note this is NOT x / max(norm, eps): the eps is *added* to the norm, which
    matters for exact parity with the PyTorch checkpoints.
    """
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)) + eps
    return x / norm
