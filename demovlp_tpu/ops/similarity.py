"""Global cosine-similarity matrix between embedding sets."""
from __future__ import annotations

import jax.numpy as jnp


def sim_matrix(a, b, eps: float = 1e-8):
    """Pairwise cosine similarity <a_i, b_j> / (|a_i| |b_j|) with norm floored
    at eps (reference model/model.py:582-590 uses max(norm, eps))."""
    a_n = jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), eps)
    b_n = jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), eps)
    return (a / a_n) @ (b / b_n).T


def cosine_similarity(x1, x2, axis=-1, eps: float = 1e-8):
    """cos(x1, x2) along `axis` with the product of norms clamped at eps
    (reference model/loss.py:286-291)."""
    w12 = jnp.sum(x1 * x2, axis=axis)
    w1 = jnp.linalg.norm(x1, axis=axis)
    w2 = jnp.linalg.norm(x2, axis=axis)
    return w12 / jnp.maximum(w1 * w2, eps)
