"""Optimizer: packed-small-leaves exactness, LR injection, step-decay pins."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from demovlp_tpu.train.optim import (
    make_optimizer,
    pack_small_leaves,
    step_decay_lr,
)


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "big": {"kernel": jnp.array(rng.randn(300, 40), jnp.float32)},
        "small": {
            "bias": jnp.array(rng.randn(40), jnp.float32),
            "scale": jnp.array(rng.randn(7), jnp.float32),
        },
        # non-f32 leaves must stay unpacked (dtype-preserving)
        "half": jnp.array(rng.randn(5), jnp.bfloat16),
    }


def _grads(seed):
    return jax.tree.map(
        lambda l: jnp.array(
            np.random.RandomState(seed + l.size).randn(*l.shape), l.dtype
        ),
        _tree(),
    )


def _run(tx, steps=3):
    params = _tree()
    state = tx.init(params)
    outs = []
    for s in range(steps):
        updates, state = tx.update(_grads(s), state, params)
        params = optax.apply_updates(params, updates)
        outs.append(params)
    return outs


def test_pack_small_adamw_exact():
    """Packing is bit-exact for (unmasked) AdamW: elementwise update, only
    the kernel structure changes."""
    plain = optax.adamw(1e-3, weight_decay=0.01)
    packed = pack_small_leaves(optax.adamw(1e-3, weight_decay=0.01), threshold=64)
    for p, q in zip(_run(plain), _run(packed)):
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p),
            jax.tree_util.tree_leaves_with_path(q),
        ):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=jax.tree_util.keystr(kp),
            )


def test_pack_small_with_global_norm_clip():
    """clip_by_global_norm reduces in a different order over the packed
    vector — same math to float associativity."""
    def mk():
        return optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-3))

    for p, q in zip(_run(mk()), _run(pack_small_leaves(mk(), threshold=64))):
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-6, atol=1e-7,
            )


def test_pack_small_under_jit_and_dtype_preserved():
    tx = pack_small_leaves(optax.adamw(1e-3), threshold=64)
    params = _tree()
    state = tx.init(params)

    @jax.jit
    def step(state, params, grads):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    params2, state = step(state, params, _grads(0))
    assert params2["half"].dtype == jnp.bfloat16
    assert params2["small"]["bias"].shape == (40,)
    # second call hits the same compiled executable (static packing plan)
    params3, state = step(state, params2, _grads(1))
    assert np.isfinite(np.asarray(params3["big"]["kernel"])).all()


def test_make_optimizer_pack_small_lr_injection():
    """The trainers retune opt_state.hyperparams['learning_rate'] in-place
    (train/steps.py) — that path must survive the packing wrapper."""
    tx = make_optimizer(lr=1e-3, pack_small=True)
    params = _tree()
    state = tx.init(params)
    g = _grads(0)

    updates, _ = tx.update(g, state, params)
    state.hyperparams["learning_rate"] = jnp.asarray(1e-4, jnp.float32)
    updates_small, _ = tx.update(g, state, params)
    a = np.asarray(updates["big"]["kernel"])
    b = np.asarray(updates_small["big"]["kernel"])
    np.testing.assert_allclose(b, a * 0.1, rtol=1e-5)


def test_step_decay_lr_reference_semantics():
    # epoch 1 at config lr; epoch 2+ at lr1 * 0.1^(milestones passed)
    assert step_decay_lr(1, 3e-5, 2e-4, [2, 4]) == 3e-5
    assert step_decay_lr(2, 3e-5, 2e-4, [2, 4]) == 2e-4
    assert step_decay_lr(3, 3e-5, 2e-4, [2, 4]) == pytest.approx(2e-5)
    assert step_decay_lr(5, 3e-5, 2e-4, [2, 4]) == pytest.approx(2e-6)


def test_pack_small_full_train_step_exact():
    """The jitted SPMD retrieval train step (donated state, in-jit LR
    injection) produces identical params with pack_small on/off — same loss
    scalar, params equal up to XLA fusion-reordering ulps (the two configs
    compile to different fusion groupings; observed max dev 6e-11)."""
    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel import create_mesh, shard_batch
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.train.steps import make_retrieval_train_step

    model = ObjectRelation(
        object_num=4, num_frames=2, projection_dim=16,
        text_config=DistilBertConfig(
            vocab_size=1000, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
            max_position_embeddings=128,
        ),
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, 1000, size=(8, 100)).astype(np.int32),
        "attention_mask": np.ones((8, 100), np.int32),
        "object": rng.randn(8, 2, 4, 2054).astype(np.float32),
        "object_mask": np.ones((8, 2, 4), np.float32),
    }
    loss = GlobalLocalLoss(
        use_local=True, use_global=True, coef=1.0, focal_type="equal"
    )
    mesh = create_mesh()
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(np.asarray, model.init(key, batch))

    results = {}
    for pack in (False, True):
        tx = make_optimizer(lr=1e-3, pack_small=pack)
        state = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
        step = make_retrieval_train_step(model, loss, tx, mesh)
        state, m = step(state, shard_batch(batch, mesh), 1e-3, key)
        state, m = step(state, shard_batch(batch, mesh), 1e-3, key)
        results[pack] = (float(m["loss"]), jax.tree.map(np.asarray, state.params))

    assert results[False][0] == results[True][0]
    for a, b in zip(
        jax.tree.leaves(results[False][1]), jax.tree.leaves(results[True][1])
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9)
