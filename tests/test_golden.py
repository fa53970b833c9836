"""Golden-value regression tests: fixed seeds through model init -> forward
-> global+local loss. Values recorded on CPU fp32 (commit 21170d2); any
change to init, architecture, masking, or loss math must be deliberate and
re-record these."""
import numpy as np

import jax
import jax.numpy as jnp

from demovlp_tpu.losses import GlobalLocalLoss
from demovlp_tpu.models import ObjectRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.ops.masking import additive_mask
from demovlp_tpu.ops.similarity import sim_matrix

TINY = DistilBertConfig(
    vocab_size=256, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=64,
)

GOLDEN = {
    "total": 19.281691,
    "global": 7.252214,
    "local": 12.029476,
    "gt0": 0.741311,
    "go0": 0.794798,
    "gsim00": 0.270645,
}


def test_pipeline_golden_values():
    model = ObjectRelation(
        object_num=4, num_frames=2, projection_dim=16, text_config=TINY,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    rng = np.random.RandomState(42)
    b = 4
    batch = {
        "input_ids": rng.randint(1, 256, size=(b, 12)).astype(np.int32),
        "attention_mask": (
            np.arange(12)[None, :] < rng.randint(4, 13, size=(b, 1))
        ).astype(np.int32),
        "object": rng.randn(b, 2, 4, 2054).astype(np.float32),
        "object_mask": (
            np.arange(4)[None, None, :] < rng.randint(1, 5, size=(b, 2, 1))
        ).astype(np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    loss = GlobalLocalLoss(
        use_local=True, use_global=True, coef=1.0, focal_type="equal"
    )
    gsim = sim_matrix(
        out["global_text_embeddings"], out["global_object_embeddings"]
    )
    tmask = additive_mask(batch["attention_mask"][:, 1:])
    tlen = batch["attention_mask"].sum(1)
    total, g, l = loss(
        gsim,
        out["local_object_embeddings"],
        out["local_text_embeddings"],
        out["object_mask"],
        tlen,
        tmask,
    )
    tol = dict(rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(total), GOLDEN["total"], **tol)
    np.testing.assert_allclose(float(g), GOLDEN["global"], **tol)
    np.testing.assert_allclose(float(l), GOLDEN["local"], **tol)
    np.testing.assert_allclose(
        float(out["global_text_embeddings"][0, 0]), GOLDEN["gt0"], **tol
    )
    np.testing.assert_allclose(
        float(out["global_object_embeddings"][0, 0]), GOLDEN["go0"], **tol
    )
    np.testing.assert_allclose(float(gsim[0, 0]), GOLDEN["gsim00"], **tol)
