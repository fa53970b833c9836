"""Fused grouped-attention kernel vs XLA (interpreter mode).

The kernel (ops/pallas_attention.py) is a TEST-ONLY measurement artifact:
`attn_impl='pallas'` was removed from the model/config surface (it never
ran on compiled TPU and measured no win over XLA at the tower's tiny
grouped shapes), so these tests pin the kernel itself plus the build-time
rejection of the retired config value."""
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


def test_model_rejects_retired_pallas_value():
    """The retired 'pallas' value fails loudly at trace time (model level)
    and at build time (config level) — no config value may exist whose only
    hardware behavior is a crash."""
    from demovlp_tpu.models import ObjectTransformer

    x = jnp.array(np.random.RandomState(0).randn(1, 1, 4, 2054), jnp.float32)
    mask = jnp.ones((1, 1, 4))
    m = ObjectTransformer(region_nums=4, num_frames=1, output_dim=16,
                          embed_dim=32, depth=1, num_heads=2,
                          attn_impl="pallas")
    with pytest.raises(ValueError, match="unknown attn_impl"):
        m.init(jax.random.PRNGKey(0), x, mask)


def test_build_model_rejects_retired_pallas_value(tmp_path):
    import json

    from demovlp_tpu.cli.common import build_model
    from demovlp_tpu.config import ConfigParser, build_argparser

    repo = __import__("pathlib").Path(__file__).resolve().parent.parent
    cfg = json.loads(
        (repo / "configs" / "smoke" / "synthetic_retrieval.json").read_text()
    )
    cfg["arch"]["args"]["object_params"]["attn_impl"] = "pallas"
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    args = build_argparser().parse_args(["-c", str(p)])
    config = ConfigParser(args, timestamp=False)
    with pytest.raises(ValueError, match="was removed"):
        build_model(config)
