"""Online region extraction (PatchRegionExtractor): emits the offline
bottom-up-attention contract and drives the full retrieval model from raw
pixels — the BASELINE.json stretch item (reference treats extraction as an
external Caffe black box, README.md:69)."""
import numpy as np

import jax
import jax.numpy as jnp

from demovlp_tpu.models import ObjectRelation, PatchRegionExtractor
from demovlp_tpu.models.distilbert import DistilBertConfig


def _frames(b=2, f=2, h=32, w=32, seed=0):
    return np.random.RandomState(seed).rand(b, f, h, w, 3).astype(np.float32)


def test_extractor_contract():
    ex = PatchRegionExtractor(object_num=3, patch=16, embed_dim=32, depth=1,
                              heads=2)
    frames = _frames()
    params = ex.init(jax.random.PRNGKey(0), frames)
    out = ex.apply(params, frames)
    assert out["object"].shape == (2, 2, 3, 2054)
    assert out["object_mask"].shape == (2, 2, 3)
    # conf sorted descending (the offline reader's conf-sort)
    conf = np.asarray(out["conf"])
    assert (np.diff(conf, axis=-1) <= 1e-6).all()
    # geometry block is normalized patch boxes
    geom = np.asarray(out["object"][..., 2048:])
    assert geom.min() >= 0.0 and geom.max() <= 1.0
    assert np.allclose(geom[..., 2] - geom[..., 0], geom[..., 4], atol=1e-6)


def test_extractor_feeds_retrieval_model_and_grads_flow():
    ex = PatchRegionExtractor(object_num=4, patch=16, embed_dim=32, depth=1,
                              heads=2)
    tiny = DistilBertConfig(vocab_size=300, dim=32, n_layers=1, n_heads=4,
                            hidden_dim=64, max_position_embeddings=32)
    model = ObjectRelation(object_num=4, num_frames=2, projection_dim=8,
                           text_config=tiny, object_embed_dim=32,
                           object_depth=1, object_heads=4)
    frames = _frames()
    rng = np.random.RandomState(1)
    text = {
        "input_ids": rng.randint(1, 300, size=(2, 16)).astype(np.int32),
        "attention_mask": np.ones((2, 16), np.int32),
    }
    ex_params = ex.init(jax.random.PRNGKey(0), frames)
    regions = ex.apply(ex_params, frames)
    batch = {**text, "object": regions["object"],
             "object_mask": regions["object_mask"]}
    m_params = model.init(jax.random.PRNGKey(1), batch)

    def loss_fn(ep):
        r = ex.apply(ep, frames)
        out = model.apply(
            m_params,
            {**text, "object": r["object"], "object_mask": r["object_mask"]},
            deterministic=True,
        )
        return jnp.sum(out["global_object_embeddings"] ** 2)

    val, grads = jax.value_and_grad(loss_fn)(ex_params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0  # end-to-end trainable from pixels
