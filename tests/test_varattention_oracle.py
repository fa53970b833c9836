"""Independent numpy oracle for the divided space-time attention.

Written from the behavioral spec (CLS attends over the whole sequence;
non-CLS tokens attend within their frame (space) or across frames at the
same region index (time), always with the CLS key/value prepended; masks are
additive) — NOT from either implementation, so structural bugs in
VarAttention can't hide.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demovlp_tpu.models.object_transformer import VarAttention


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_var_attention(x, add_mask, params, mode, F, K, h):
    """x (B, 1+F*K, D); params: qkv kernel/bias, proj kernel/bias."""
    B, N1, D = x.shape
    hd = D // h
    qkv = x @ params["qkv"]["kernel"] + params["qkv"]["bias"]
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, N1, h, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = q * (hd ** -0.5)

    out = np.zeros((B, h, N1, hd), dtype=np.float64)
    for b in range(B):
        for hh in range(h):
            # CLS: attends over everything
            logits = q[b, hh, 0] @ k[b, hh].T + add_mask[b]
            out[b, hh, 0] = np_softmax(logits) @ v[b, hh]
            # grouped tokens
            for t in range(1, N1):
                fi, ki = (t - 1) // K, (t - 1) % K
                if mode == "space":
                    group = [0] + [1 + fi * K + j for j in range(K)]
                else:
                    group = [0] + [1 + f2 * K + ki for f2 in range(F)]
                kk = k[b, hh][group]
                vv = v[b, hh][group]
                mm = add_mask[b][group]
                logits = q[b, hh, t] @ kk.T + mm
                out[b, hh, t] = np_softmax(logits) @ vv
    out = out.transpose(0, 2, 1, 3).reshape(B, N1, D)
    return out @ params["proj"]["kernel"] + params["proj"]["bias"]


@pytest.mark.parametrize("attn_impl", ["xla", "dense"])
@pytest.mark.parametrize(
    "mode,F,K",
    [
        ("space", 3, 4),
        ("time", 3, 4),
        # single-group shapes: exercise the full-attention fast path
        # (space at F=1 — the flagship pre-train shape — and time at K=1)
        ("space", 1, 4),
        ("time", 3, 1),
    ],
)
def test_var_attention_matches_oracle(mode, F, K, attn_impl):
    B, D, h = 2, 16, 2
    N1 = 1 + F * K
    rng = np.random.RandomState(0)
    x = rng.randn(B, N1, D).astype(np.float32)
    binary = (rng.rand(B, N1) > 0.3).astype(np.float32)
    binary[:, 0] = 1.0
    add_mask = (binary - 1.0) * 100.0

    mod = VarAttention(dim=D, num_heads=h, attn_impl=attn_impl)
    params = mod.init(
        jax.random.PRNGKey(0), jnp.array(x), jnp.array(add_mask), mode, F, K
    )
    got = np.asarray(
        mod.apply(params, jnp.array(x), jnp.array(add_mask), mode, F, K)
    )

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    want = np_var_attention(
        x.astype(np.float64), add_mask.astype(np.float64), p, mode, F, K, h
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unknown_attn_impl_rejected():
    """A typo'd attn_impl must raise, not silently run the xla path."""
    mod = VarAttention(dim=16, num_heads=2, attn_impl="desne")
    x = jnp.zeros((1, 5, 16))
    m = jnp.zeros((1, 5))
    with pytest.raises(ValueError, match="attn_impl"):
        mod.init(jax.random.PRNGKey(0), x, m, "space", 1, 4)
