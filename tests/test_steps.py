import numpy as np
import pytest

from demovlp_tpu.train.steps import pad_batch, prepare_batch
from demovlp_tpu.train.checkpoint import find_latest_checkpoint
from demovlp_tpu.data.tokenizer import SimpleTokenizer


def test_pad_batch():
    arrays = {
        "a": np.arange(12).reshape(3, 4).astype(np.float32),
        "b": np.arange(3).astype(np.int32),
    }
    padded, n = pad_batch(arrays, 5)
    assert n == 3
    assert padded["a"].shape == (5, 4)
    np.testing.assert_array_equal(padded["a"][3], padded["a"][0])
    np.testing.assert_array_equal(padded["b"][:3], arrays["b"])
    # already full: identity
    same, n2 = pad_batch(arrays, 3)
    assert n2 == 3 and same is arrays


def test_prepare_batch_flattens_mc_options():
    tok = SimpleTokenizer(max_length=16)
    batch = {
        "text": [["opt a", "opt b", "opt c"]],
        "object": np.zeros((1, 2, 4, 2054), np.float32),
        "object_mask": np.ones((1, 2, 4), np.float32),
    }
    arrays = prepare_batch(batch, tok, max_text_len=16)
    assert arrays["input_ids"].shape == (3, 16)  # options flattened


def test_prepare_batch_includes_label():
    tok = SimpleTokenizer(max_length=16)
    batch = {
        "text": ["q1", "q2"],
        "object": np.zeros((2, 1, 4, 2054), np.float32),
        "object_mask": np.ones((2, 1, 4), np.float32),
        "label": np.array([3, 7], np.int32),
    }
    arrays = prepare_batch(batch, tok, max_text_len=16)
    np.testing.assert_array_equal(arrays["label"], [3, 7])


def test_find_latest_checkpoint(tmp_path):
    assert find_latest_checkpoint(tmp_path, "exp") is None
    base = tmp_path / "models" / "exp"

    def mk(run, epoch, complete=True):
        d = base / run / f"checkpoint-epoch{epoch}"
        d.mkdir(parents=True)
        if complete:  # meta.json is the commit marker
            (d / "meta.json").write_text("{}")
        return d

    mk("0101_000000", 2)
    mk("0102_000000", 1)
    mk("0102_000000", 3)
    latest = find_latest_checkpoint(tmp_path, "exp")
    assert latest.name == "checkpoint-epoch3"
    assert latest.parent.name == "0102_000000"
    # an interrupted save (no commit marker) and an orbax tmp dir must
    # never be selected for auto-resume
    mk("0102_000000", 4, complete=False)
    (base / "0102_000000"
     / "checkpoint-epoch5.orbax-checkpoint-tmp").mkdir()
    assert find_latest_checkpoint(tmp_path, "exp").name == "checkpoint-epoch3"


def test_cast_tower_weights_contract():
    """cast_tower_weights pre-rounds exactly the weights the bf16 towers
    round per-op anyway, and leaves the f32-by-design params (norm
    scales/biases, text Embed tables, additive region pos/temporal embeds)
    untouched — so a bf16-model step with cast_weights=True matches one
    without it."""
    import jax
    import jax.numpy as jnp

    from demovlp_tpu.data.tokenizer import SimpleTokenizer
    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train import make_optimizer
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.train.steps import (cast_tower_weights,
                                         make_retrieval_train_step)

    tok = SimpleTokenizer()
    rng = np.random.RandomState(0)
    batch = prepare_batch(
        {
            "text": [f"a short caption {i}" for i in range(8)],
            "object": rng.randn(8, 1, 2, 2054).astype(np.float32),
            "object_mask": np.ones((8, 1, 2), np.float32),
        },
        tok,
    )

    tiny_text = DistilBertConfig(
        vocab_size=30522, dim=16, n_layers=1, n_heads=2, hidden_dim=32,
        max_position_embeddings=128,
    )
    model = ObjectRelation(
        object_num=2, num_frames=1, projection_dim=8,
        text_config=tiny_text, object_embed_dim=16, object_depth=1,
        object_heads=2, dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), batch)

    # exemption shape: f32-by-design leaves keep f32, Dense kernels go bf16
    casted = cast_tower_weights(params)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(casted)}
    exempt = [k for k in flat
              if any(t in k for t in ("word_embeddings", "position_embeddings",
                                      "custom_pos_embed", "temporal_embed"))
              or "norm" in k.lower()]
    assert exempt, "expected exempt leaves in the tiny model"
    for k in exempt:
        assert flat[k].dtype == jnp.float32, k
    dense = [k for k in flat if "txt_proj" in k or "qkv" in k]
    assert dense
    for k in dense:
        assert flat[k].dtype == jnp.bfloat16, k

    # end-to-end: one step with and without the fused pre-cast agrees
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal")
    tx = make_optimizer(lr=1e-3)
    mesh = create_mesh()
    # the step donates its state: give each run a fresh device copy
    params_host = jax.tree.map(np.asarray, params)
    results = []
    for cw in (False, True):
        state = TrainState.create(
            jax.tree.map(jnp.asarray, params_host), tx)
        step = make_retrieval_train_step(model, loss, tx, mesh,
                                         deterministic=True, cast_weights=cw)
        state, m = step(state, shard_batch(batch, mesh), 1e-3,
                        jax.random.PRNGKey(1))
        results.append(float(m["loss"]))
    assert np.isfinite(results[0])
    np.testing.assert_allclose(results[1], results[0], rtol=1e-6, atol=1e-7)
