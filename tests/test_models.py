import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demovlp_tpu.models import (
    ObjectTransformer,
    DistilBertConfig,
    DistilBertModel,
    BUTDQAHead,
    ObjectRelation,
    ObjectQARelation,
    ObjectMCRelation,
)

TINY_TEXT = DistilBertConfig(
    vocab_size=128, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=64,
)


def _object_batch(b=2, f=4, k=6, c=2054, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(b, f, k, c).astype(np.float32)
    lens = rng.randint(1, k + 1, size=(b, f))
    mask = (np.arange(k)[None, None, :] < lens[..., None]).astype(np.float32)
    return jnp.array(feats), jnp.array(mask)


def test_object_transformer_shapes():
    """The reference's __main__ smoke block (object_transformer.py:486-493)
    as a real test: zeros input, ones mask -> (B, 1+F*K, out)."""
    x = jnp.zeros([2, 4, 10, 2054])
    mask = jnp.ones([2, 4, 10])
    model = ObjectTransformer(
        region_nums=10, num_frames=4, output_dim=64,
        embed_dim=32, depth=2, num_heads=4,
    )
    params = model.init(jax.random.PRNGKey(0), x, mask)
    y, add_mask = model.apply(params, x, mask)
    assert y.shape == (2, 1 + 4 * 10, 64)
    assert add_mask.shape == (2, 1 + 4 * 10)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_array_equal(np.asarray(add_mask), 0.0)


def test_object_transformer_additive_mask_values():
    x, mask = _object_batch(b=2, f=2, k=4)
    model = ObjectTransformer(
        region_nums=4, num_frames=2, output_dim=16,
        embed_dim=16, depth=1, num_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), x, mask)
    _, add_mask = model.apply(params, x, mask)
    add_mask = np.asarray(add_mask)
    assert add_mask[0, 0] == 0.0  # CLS always valid
    binary = np.concatenate(
        [np.ones((2, 1)), np.asarray(mask).reshape(2, -1)], axis=1
    )
    np.testing.assert_allclose(add_mask, (binary - 1.0) * 100.0)


def test_object_transformer_masked_regions_do_not_affect_output():
    """Changing the feature values of fully-masked regions must not change
    CLS/valid-token outputs (mask soft at -100*20? no: attn logits get -100
    added pre-softmax at scale 1, enough to suppress to ~4e-44)."""
    x, mask = _object_batch(b=1, f=2, k=4, seed=3)
    mask = mask.at[0, :, 2:].set(0.0)  # only 2 valid regions per frame
    model = ObjectTransformer(
        region_nums=4, num_frames=2, output_dim=16,
        embed_dim=16, depth=2, num_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), x, mask)
    y1, _ = model.apply(params, x, mask)
    x2 = x.at[0, :, 2:, :].set(999.0)
    y2, _ = model.apply(params, x2, mask)
    # CLS + valid tokens unchanged
    np.testing.assert_allclose(
        np.asarray(y1[0, 0]), np.asarray(y2[0, 0]), rtol=1e-4, atol=1e-5
    )


def test_timeattn_variant_runs():
    x, mask = _object_batch(b=1, f=3, k=4)
    model = ObjectTransformer(
        region_nums=4, num_frames=3, output_dim=16,
        embed_dim=16, depth=1, num_heads=2, time_module="timeattn",
    )
    params = model.init(jax.random.PRNGKey(0), x, mask)
    y, _ = model.apply(params, x, mask)
    assert y.shape == (1, 13, 16)
    assert np.isfinite(np.asarray(y)).all()
    # timeattn params exist
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("timeattn" in n for n in names)


def test_object_transformer_dense_attn_matches_xla():
    """Full 2-block model (timeattn + space + partial masks): the dense
    masked-full-attention path must reproduce the grouped path exactly up
    to reduction-order ulps (same params, multi-group F=3/K=4 shape)."""
    x, mask = _object_batch(b=2, f=3, k=4, seed=7)
    kw = dict(
        region_nums=4, num_frames=3, output_dim=16,
        embed_dim=16, depth=2, num_heads=2, time_module="timeattn",
    )
    m_xla = ObjectTransformer(**kw, attn_impl="xla")
    m_dense = ObjectTransformer(**kw, attn_impl="dense")
    params = m_xla.init(jax.random.PRNGKey(0), x, mask)
    y_xla, _ = m_xla.apply(params, x, mask)
    y_dense, _ = m_dense.apply(params, x, mask)
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_xla), rtol=1e-4, atol=1e-5
    )


def test_distilbert_shapes_and_mask():
    cfg = TINY_TEXT
    model = DistilBertModel(cfg)
    ids = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 0, 0, 0, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (2, 6, cfg.dim)
    # padded token VALUES must not affect valid-position outputs
    ids2 = ids.at[0, 4:].set(99)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out[0, :4]), np.asarray(out2[0, :4]), rtol=1e-5, atol=1e-6
    )


def test_butd_qa_head():
    head = BUTDQAHead(v_dim=16, q_dim=16, hid_dim=16, out_dim=11)
    txt = jnp.array(np.random.RandomState(0).randn(3, 16), dtype=jnp.float32)
    obj = jnp.array(np.random.RandomState(1).randn(3, 12, 16), dtype=jnp.float32)
    mask = jnp.ones((3, 12))
    params = head.init(jax.random.PRNGKey(0), txt, obj, mask)
    logits = head.apply(params, txt, obj, mask)
    assert logits.shape == (3, 11)
    assert np.isfinite(np.asarray(logits)).all()


def _retrieval_batch(b=2, f=2, k=4, l=8, vocab=128, seed=0):
    rng = np.random.RandomState(seed)
    obj, omask = _object_batch(b, f, k, seed=seed)
    ids = rng.randint(1, vocab, size=(b, l)).astype(np.int32)
    tmask = (np.arange(l)[None, :] < rng.randint(2, l + 1, size=(b, 1))).astype(np.int32)
    return {
        "input_ids": jnp.array(ids),
        "attention_mask": jnp.array(tmask),
        "object": obj,
        "object_mask": omask,
    }


def _tiny_retrieval_model(**kw):
    return ObjectRelation(
        object_num=4, num_frames=2, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
        **kw,
    )


def test_object_relation_forward():
    batch = _retrieval_batch()
    model = _tiny_retrieval_model()
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    b, f, k, l = 2, 2, 4, 8
    assert out["global_text_embeddings"].shape == (b, 16)
    assert out["local_text_embeddings"].shape == (b, l - 1, 16)
    assert out["global_object_embeddings"].shape == (b, 16)
    assert out["local_object_embeddings"].shape == (b, f * k, 16)
    assert out["object_mask"].shape == (b, f * k)
    # object_mask is additive with CLS trimmed
    assert set(np.unique(np.asarray(out["object_mask"]))) <= {0.0, -100.0}


def test_object_qa_relation_forward():
    batch = _retrieval_batch()
    model = ObjectQARelation(
        object_num=4, num_frames=2, num_label=10, projection_dim=16,
        text_config=TINY_TEXT, object_embed_dim=32, object_depth=2, object_heads=4,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out["logits"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_object_mc_relation_is_object_relation():
    batch = _retrieval_batch()
    model = ObjectMCRelation(
        object_num=4, num_frames=2, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert "global_text_embeddings" in out


def test_object_relation_jit_and_grad():
    batch = _retrieval_batch()
    model = _tiny_retrieval_model()
    params = model.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, batch, deterministic=True)
        return jnp.sum(out["global_text_embeddings"] ** 2) + jnp.sum(
            out["global_object_embeddings"] ** 2
        )

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
