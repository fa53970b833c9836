"""MLM pre-training objective: head params exist, step runs, loss falls
with training signal."""
import numpy as np

import jax
import jax.numpy as jnp

from demovlp_tpu.losses import GlobalLocalLoss
from demovlp_tpu.models import ObjectRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh
from demovlp_tpu.parallel.mesh import shard_batch
from demovlp_tpu.train import make_optimizer
from demovlp_tpu.train.state import TrainState
from demovlp_tpu.train.steps import make_retrieval_train_step, mlm_loss_fn
from demovlp_tpu.data.mlm import mask_batch_text_tokens

TINY = DistilBertConfig(
    vocab_size=256, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=64,
)


def test_mlm_loss_fn_ignores_unselected():
    rng = np.random.RandomState(0)
    logits = jnp.array(rng.randn(2, 5, 7), jnp.float32)
    labels = jnp.array([[1, -100, 3, -100, -100], [-100] * 5])
    loss = float(mlm_loss_fn(logits, labels))
    assert np.isfinite(loss) and loss > 0
    # all-ignored -> 0 (guarded denominator)
    loss0 = float(mlm_loss_fn(logits, jnp.full((2, 5), -100)))
    assert loss0 == 0.0


def test_mlm_train_step():
    model = ObjectRelation(
        object_num=4, num_frames=1, projection_dim=16, text_config=TINY,
        object_embed_dim=32, object_depth=1, object_heads=4, with_mlm=True,
    )
    rng = np.random.RandomState(0)
    b, l = 8, 16
    batch = {
        "input_ids": rng.randint(1, 256, size=(b, l)).astype(np.int32),
        "attention_mask": np.ones((b, l), np.int32),
        "object": rng.randn(b, 1, 4, 2054).astype(np.float32),
        "object_mask": np.ones((b, 1, 4), np.float32),
    }
    gen = np.random.default_rng(0)
    masked, labels = mask_batch_text_tokens(
        batch["input_ids"], batch["attention_mask"], mask_token_id=103,
        vocab_size=256, rng=gen, mlm_probability=0.3,
    )
    batch["input_ids"] = masked
    batch["mlm_labels"] = labels

    key = jax.random.PRNGKey(0)
    params = model.init(key, batch)
    names = jax.tree_util.tree_leaves_with_path(params)
    assert any("mlm_head" in "/".join(map(str, p)) for p, _ in names)

    mesh = create_mesh()
    loss = GlobalLocalLoss(use_local=False, use_global=True,
                           coef=1.0, focal_type="equal")
    tx = make_optimizer(lr=1e-3)
    state = TrainState.create(params, tx)
    step = make_retrieval_train_step(model, loss, tx, mesh, mlm_weight=1.0)
    sb = shard_batch(batch, mesh)
    losses = []
    for _ in range(4):
        state, m = step(state, sb, 1e-3, key)
        losses.append(float(m["mlm_loss"]))
    assert all(np.isfinite(x) for x in losses)
    assert losses[-1] < losses[0]  # overfits the fixed masked batch
