"""Fused grouped-attention kernel vs XLA (interpreter mode), plus model-level
attn_impl equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demovlp_tpu.ops.pallas_attention import (
    grouped_attention_pallas,
    grouped_attention_xla,
)


def _inputs(g=10, lq=6, lk=7, hd=12, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(g, lq, hd).astype(np.float32)
    k = rng.randn(g, lk, hd).astype(np.float32)
    v = rng.randn(g, lk, hd).astype(np.float32)
    bias = ((rng.rand(g, lk) > 0.2).astype(np.float32) - 1) * 100
    return map(jnp.array, (q, k, v, bias))


def test_grouped_attention_pallas_matches_xla():
    q, k, v, bias = _inputs()
    want = np.asarray(grouped_attention_xla(q, k, v, bias))
    got = np.asarray(grouped_attention_pallas(q, k, v, bias, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grouped_attention_fully_masked_group():
    """A group whose keys are all masked still produces finite output
    (uniform attention over the -1e9 biased keys)."""
    q, k, v, bias = _inputs(g=4)
    bias = bias.at[0].set(-100.0)
    got = np.asarray(grouped_attention_pallas(q, k, v, bias, interpret=True))
    assert np.isfinite(got).all()


def test_model_attn_impl_equivalence_interpret():
    """ObjectTransformer forward identical under attn_impl xla/pallas
    (interpret mode via force_tpu_interpret_mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from demovlp_tpu.models import ObjectTransformer

    x = jnp.array(np.random.RandomState(0).randn(2, 2, 4, 2054), jnp.float32)
    mask = jnp.ones((2, 2, 4))
    kw = dict(region_nums=4, num_frames=2, output_dim=16,
              embed_dim=32, depth=1, num_heads=2)
    m_xla = ObjectTransformer(**kw, attn_impl="xla")
    m_pal = ObjectTransformer(**kw, attn_impl="pallas")
    params = m_xla.init(jax.random.PRNGKey(0), x, mask)
    y_xla, _ = m_xla.apply(params, x, mask)
    with pltpu.force_tpu_interpret_mode():
        y_pal, _ = m_pal.apply(params, x, mask)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_xla), rtol=1e-4, atol=1e-5
    )
