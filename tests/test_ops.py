import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demovlp_tpu.ops import (
    additive_mask,
    l2norm,
    sim_matrix,
    cosine_similarity,
    func_attention,
    xattn_score,
)
from demovlp_tpu.ops.xattn import xattn_score_blockwise

from .oracles import np_func_attention, np_xattn_score, np_l2norm


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _masks(b, l, seed=1):
    rng = np.random.RandomState(seed)
    lens = rng.randint(1, l + 1, size=b)
    binary = (np.arange(l)[None, :] < lens[:, None]).astype(np.float32)
    return (binary - 1.0) * 100.0


def test_additive_mask():
    m = jnp.array([[1.0, 1.0, 0.0]])
    out = additive_mask(m)
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0, -100.0]])


def test_l2norm_matches_reference_form():
    x = _rand(4, 7)
    got = np.asarray(l2norm(jnp.array(x)))
    want = np_l2norm(x)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sim_matrix_cosine():
    a = _rand(5, 16, seed=2)
    b = _rand(7, 16, seed=3)
    got = np.asarray(sim_matrix(jnp.array(a), jnp.array(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(got, an @ bn.T, rtol=1e-5, atol=1e-6)
    # zero rows don't produce NaN (eps floor)
    a0 = np.zeros((2, 16), np.float32)
    out = np.asarray(sim_matrix(jnp.array(a0), jnp.array(b)))
    assert np.isfinite(out).all()


def test_cosine_similarity_eps_clamp():
    x = np.zeros((3, 4), np.float32)
    y = _rand(3, 4, seed=4)
    out = np.asarray(cosine_similarity(jnp.array(x), jnp.array(y)))
    assert np.isfinite(out).all()


@pytest.mark.parametrize("focal_type", ["prob", "equal"])
def test_func_attention_vs_oracle(focal_type):
    q = _rand(3, 5, 8, seed=5)
    c = _rand(4, 6, 8, seed=6)
    qm = _masks(3, 5, seed=7)
    cm = _masks(4, 6, seed=8)
    got = np.asarray(
        func_attention(jnp.array(q), jnp.array(c), jnp.array(qm), jnp.array(cm),
                       20.0, focal_type)
    )
    want = np_func_attention(q, c, qm, cm, 20.0, focal_type)
    assert got.shape == (4, 3, 5, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("focal_type", ["prob", "equal"])
def test_xattn_score_vs_oracle(focal_type):
    im = _rand(4, 6, 8, seed=9)
    s = _rand(4, 5, 8, seed=10)
    imm = _masks(4, 6, seed=11)
    sm = _masks(4, 5, seed=12)
    got = np.asarray(
        xattn_score(jnp.array(im), jnp.array(s), jnp.array(imm), jnp.array(sm),
                    20.0, focal_type)
    )
    want = np_xattn_score(im, s, imm, sm, 20.0, focal_type)
    assert got.shape == (4, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_xattn_query_mask_is_noop():
    """The query-side additive mask cancels in the source-axis softmax —
    documented reference quirk we must preserve."""
    im = _rand(3, 6, 8, seed=13)
    s = _rand(3, 5, 8, seed=14)
    imm = jnp.zeros((3, 6))
    sm0 = jnp.zeros((3, 5))
    sm1 = jnp.array(_masks(3, 5, seed=15))
    # cap_mask enters i2t as the (no-op) query mask AND t2i as context mask,
    # so compare func_attention directly where it's pure query mask.
    a = func_attention(jnp.array(s), jnp.array(im), sm0, imm, 20.0, "equal")
    b = func_attention(jnp.array(s), jnp.array(im), sm1, imm, 20.0, "equal")
    # exact in real arithmetic; the +(-100) shift costs fp32 mantissa bits
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5)


def test_xattn_blockwise_matches_dense():
    im = _rand(8, 6, 8, seed=16)
    s = _rand(5, 5, 8, seed=17)
    imm = jnp.array(_masks(8, 6, seed=18))
    sm = jnp.array(_masks(5, 5, seed=19))
    dense = xattn_score(jnp.array(im), jnp.array(s), imm, sm, 20.0, "equal")
    blocked = xattn_score_blockwise(
        jnp.array(im), jnp.array(s), imm, sm, segment=4,
        lambda_softmax=20.0, focal_type="equal"
    )
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("focal_type", ["equal", "prob"])
@pytest.mark.parametrize("compute_dtype", [None, jnp.bfloat16])
def test_xattn_gram_matches_weighted_context(focal_type, compute_dtype, monkeypatch):
    """The Gram-form cosine (no (B^2, Lq, D) weighted-context tensor) equals
    the original weighted-context formulation: f32 to float-associativity,
    bf16 within the bf16 pipeline's own rounding envelope."""
    from demovlp_tpu.ops.xattn import _xattn_score_xla

    im = _rand(5, 7, 16, seed=20)
    s = _rand(6, 9, 16, seed=21)
    imm = _masks(5, 7, seed=22)
    sm = _masks(6, 9, seed=23)
    args = (jnp.array(im), jnp.array(s), jnp.array(imm), jnp.array(sm),
            20.0, focal_type, compute_dtype)
    monkeypatch.setenv("DEMOVLP_XATTN_GRAM", "1")
    got = np.asarray(_xattn_score_xla(*args))
    monkeypatch.setenv("DEMOVLP_XATTN_GRAM", "0")
    want = np.asarray(_xattn_score_xla(*args))
    tol = 1e-5 if compute_dtype is None else 2e-2
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_xattn_gram_gradients_match(monkeypatch):
    """Training uses grad-of-xattn_score: the Gram form's VJP must agree
    with the weighted-context form's."""
    from demovlp_tpu.ops.xattn import _xattn_score_xla

    im = _rand(4, 5, 8, seed=30)
    s = _rand(4, 6, 8, seed=31)
    imm = _masks(4, 5, seed=32)
    sm = _masks(4, 6, seed=33)

    def loss(im_, s_, flag):
        monkeypatch.setenv("DEMOVLP_XATTN_GRAM", flag)
        sims = _xattn_score_xla(im_, s_, jnp.array(imm), jnp.array(sm),
                                20.0, "equal", None)
        return jnp.sum(sims * jnp.cos(jnp.arange(sims.size).reshape(sims.shape)))

    g1 = jax.grad(lambda a, b: loss(a, b, "1"), argnums=(0, 1))(
        jnp.array(im), jnp.array(s))
    g0 = jax.grad(lambda a, b: loss(a, b, "0"), argnums=(0, 1))(
        jnp.array(im), jnp.array(s))
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
