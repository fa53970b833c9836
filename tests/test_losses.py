import numpy as np
import jax.numpy as jnp

from demovlp_tpu.losses import (
    GlobalLocalLoss,
    NormSoftmaxLoss,
    RWALoss,
    CrossEntropy,
    MaxMarginRankingLoss,
)

from .oracles import np_softmax, np_xattn_score


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def _masks(b, l, seed=1):
    rng = np.random.RandomState(seed)
    lens = rng.randint(1, l + 1, size=b)
    binary = (np.arange(l)[None, :] < lens[:, None]).astype(np.float32)
    return (binary - 1.0) * 100.0


def test_norm_softmax_loss_oracle():
    sims = (np.random.RandomState(0).rand(10, 10).astype(np.float32) * 2) - 1
    loss = NormSoftmaxLoss(temperature=0.05)
    got = float(loss(jnp.array(sims)))

    def logsm(x):
        x = x / 0.05
        return x - np.log(np.exp(x - x.max(1, keepdims=True)).sum(1, keepdims=True)) - x.max(1, keepdims=True)

    want = -np.mean(np.diag(logsm(sims))) - np.mean(np.diag(logsm(sims.T)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rwa_loss_oracle():
    im = _rand(6, 8, 16, seed=2)
    s = _rand(6, 5, 16, seed=3)
    imm = _masks(6, 8, seed=4)
    sm = _masks(6, 5, seed=5)
    loss = RWALoss(lambda_softmax=20.0, focal_type="equal")
    got = float(loss(jnp.array(im), jnp.array(s), jnp.array(imm), None, jnp.array(sm)))

    scores = np_xattn_score(im, s, imm, sm, 20.0, "equal")
    labels = np.eye(6)
    z = scores * 20.0
    pred = np_softmax(z, axis=1)
    logsm = z - z.max(1, keepdims=True)
    logsm = logsm - np.log(np.exp(logsm).sum(1, keepdims=True))
    want = np.mean((pred * (logsm - np.log(labels + 1e-6))).sum(1))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_global_local_combinations():
    sims = jnp.array((_rand(4, 4, seed=6) * 2) - 1)
    im = jnp.array(_rand(4, 8, 16, seed=7))
    s = jnp.array(_rand(4, 5, 16, seed=8))
    imm = jnp.array(_masks(4, 8, seed=9))
    sm = jnp.array(_masks(4, 5, seed=10))

    both = GlobalLocalLoss(use_local=True, use_global=True, focal_type="equal", coef=1.0)
    g_only = GlobalLocalLoss(use_local=False, use_global=True, focal_type="equal", coef=1.0)
    l_only = GlobalLocalLoss(use_local=True, use_global=False, focal_type="equal", coef=1.0)

    total, g, l = both(sims, im, s, imm, None, sm)
    tg, gg, lg = g_only(sims, im, s, imm, None, sm)
    tl, gl, ll = l_only(sims, im, s, imm, None, sm)

    np.testing.assert_allclose(float(total), float(g) + float(l), rtol=1e-6)
    assert float(lg) == 0.0 and float(gl) == 0.0
    np.testing.assert_allclose(float(tg), float(g), rtol=1e-6)
    np.testing.assert_allclose(float(tl), float(l), rtol=1e-6)
    for v in (total, g, l):
        assert np.isfinite(float(v))


def test_cross_entropy():
    logits = jnp.array(_rand(5, 7, seed=11))
    labels = jnp.array([0, 3, 6, 2, 1])
    got = float(CrossEntropy()(logits, labels))
    x = np.asarray(logits)
    z = x - x.max(1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(1, keepdims=True))
    want = -np.mean(logp[np.arange(5), np.asarray(labels)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_max_margin_ranking():
    x = jnp.array(_rand(6, 6, seed=12))
    out = float(MaxMarginRankingLoss(margin=1.0, fix_norm=True)(x))
    assert np.isfinite(out) and out >= 0
    out2 = float(MaxMarginRankingLoss(margin=1.0, fix_norm=False)(x))
    assert np.isfinite(out2)


def test_rwa_loss_remat_matches_no_remat():
    """local_remat only changes the backward's memory/recompute schedule —
    same loss, gradients equal up to recompute reassociation (~1e-7)."""
    import jax

    im, s = _rand(8, 5, 16, seed=2), _rand(8, 7, 16, seed=3)
    im_mask, s_mask = _masks(8, 5), _masks(8, 7, seed=4)

    def loss_fn(remat):
        obj = RWALoss(focal_type="equal", local_remat=remat)
        return lambda a: obj(a, jnp.array(s), jnp.array(im_mask), None,
                             jnp.array(s_mask))

    v0, g0 = jax.value_and_grad(loss_fn(False))(jnp.array(im))
    v1, g1 = jax.value_and_grad(loss_fn(True))(jnp.array(im))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-3, atol=1e-6
    )


def test_rwa_loss_bfloat16_finite_and_close():
    """local_dtype='bfloat16' (O(B^2) pipeline in bf16, sims/CE in f32):
    finite loss + grads, loss within bf16-noise of f32. The lambda=20
    softmax amplifies bf16 rounding, so the tolerance is coarse by design
    (the knob is an opt-in throughput trade, not a parity mode)."""
    import jax

    im, s = _rand(12, 5, 16, seed=5), _rand(12, 7, 16, seed=6)
    im_mask, s_mask = _masks(12, 5, seed=7), _masks(12, 7, seed=8)

    def run(dtype):
        obj = RWALoss(focal_type="equal", local_dtype=dtype)
        fn = lambda a: obj(a, jnp.array(s), jnp.array(im_mask), None,
                           jnp.array(s_mask))
        return jax.value_and_grad(fn)(jnp.array(im))

    v32, g32 = run("float32")
    vbf, gbf = run("bfloat16")
    assert np.isfinite(float(vbf))
    assert np.isfinite(np.asarray(gbf)).all()
    assert gbf.dtype == jnp.float32  # grads w.r.t. f32 embeddings stay f32
    np.testing.assert_allclose(float(vbf), float(v32), rtol=0.05)


def test_func_attention_uniform_row_no_nan():
    """focal_equal on an exactly-uniform softmax row used to 0/0 (all
    func_f == 0): the where-select guard must fall back to the uniform
    re-attention, in both dtypes."""
    import jax

    from demovlp_tpu.ops.xattn import xattn_score

    # one image with every region identical -> attention rows exactly uniform
    im = np.tile(_rand(1, 1, 16, seed=9), (2, 4, 1)).astype(np.float32)
    s = _rand(2, 6, 16, seed=10)
    im_mask = np.zeros((2, 4), np.float32)
    s_mask = np.zeros((2, 6), np.float32)
    for dt in (None, jnp.bfloat16):
        sims = xattn_score(jnp.array(im), jnp.array(s), jnp.array(im_mask),
                           jnp.array(s_mask), 20.0, "equal", dt)
        assert np.isfinite(np.asarray(sims)).all(), dt
        g = jax.grad(
            lambda a: jnp.sum(
                xattn_score(a, jnp.array(s), jnp.array(im_mask),
                            jnp.array(s_mask), 20.0, "equal", dt)
            )
        )(jnp.array(im))
        assert np.isfinite(np.asarray(g)).all(), dt
