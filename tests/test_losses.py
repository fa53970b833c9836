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
