"""Tensor parallelism over the 'model' mesh axis, exercised for real on a
(4, 2) mesh: the full retrieval train step with Megatron-style column/row
param shardings must reproduce the pure-data-parallel result exactly (same
math, different layout). The reference has no TP; this is the TPU-native
headroom the ('data','model') mesh was designed for."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from demovlp_tpu.losses import GlobalLocalLoss
from demovlp_tpu.models import ObjectRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh, shard_batch, shard_state
from demovlp_tpu.parallel.tp import state_shardings
from demovlp_tpu.train import make_optimizer
from demovlp_tpu.train.state import TrainState
from demovlp_tpu.train.steps import make_retrieval_train_step

TINY_TEXT = DistilBertConfig(
    vocab_size=1000, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=128,
)
F, K = 2, 4


def _model():
    return ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )


def _batch(b=8):
    rng = np.random.RandomState(0)
    return {
        "input_ids": rng.randint(1, 1000, size=(b, 100)).astype(np.int32),
        "attention_mask": np.ones((b, 100), np.int32),
        "object": rng.randn(b, F, K, 2054).astype(np.float32),
        "object_mask": np.ones((b, F, K), np.float32),
    }


@pytest.fixture(scope="module")
def tp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return create_mesh(data=4, model=2)


def test_tp_specs_cover_towers(tp_mesh):
    model = _model()
    params = model.init(jax.random.PRNGKey(0), _batch(2))
    sh = state_shardings(params, tp_mesh)
    p = sh["params"]
    # region tower: fused qkv column-parallel, attn proj row-parallel
    blk = p["object_model"]["blocks_0"]
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert blk["attn"]["qkv"]["bias"].spec == P("model")
    assert blk["attn"]["proj"]["kernel"].spec == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
    # text tower
    lay = p["text_tower"]["text_model"]["layer_0"]
    assert lay["attention"]["q_lin"]["kernel"].spec == P(None, "model")
    assert lay["attention"]["out_lin"]["kernel"].spec == P("model", None)
    assert lay["ffn_lin1"]["kernel"].spec == P(None, "model")
    assert lay["ffn_lin2"]["kernel"].spec == P("model", None)
    # replicated leaves: embeddings, final projections, LayerNorms
    assert p["object_model"]["proj"]["kernel"].spec == P()
    assert p["object_model"]["object_embedding"]["kernel"].spec == P()
    assert blk["norm1"]["LayerNorm_0"]["scale"].spec == P()


def test_tp_train_step_matches_data_parallel(tp_mesh):
    model = _model()
    loss = GlobalLocalLoss(
        use_local=True, use_global=True, coef=1.0, focal_type="equal"
    )
    rng = jax.random.PRNGKey(0)
    batch = _batch(8)
    params = model.init(rng, batch)
    tx = make_optimizer(lr=1e-3)

    # TP: (4 data, 2 model) mesh, params/opt_state column/row sharded
    state_tp = shard_state(
        TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx),
        tp_mesh,
    )
    # a representative Adam mirror is sharded too, not just params
    mu = state_tp.opt_state.inner_state[0].mu
    assert (
        mu["params"]["object_model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
        .sharding.spec
        == P(None, "model")
    )
    step_tp = make_retrieval_train_step(
        model, loss, tx, tp_mesh,
        state_sharding=state_shardings(state_tp, tp_mesh),
    )
    new_tp, m_tp = step_tp(state_tp, shard_batch(batch, tp_mesh), 1e-3, rng)
    # layout survives the step
    assert (
        new_tp.params["params"]["object_model"]["blocks_0"]["mlp"]["fc1"][
            "kernel"
        ].sharding.spec
        == P(None, "model")
    )

    # reference: single-device full batch
    single = create_mesh(devices=np.array(jax.devices()[:1]))
    step1 = make_retrieval_train_step(model, loss, tx, single)
    new1, m1 = step1(TrainState.create(params, tx), batch, 1e-3, rng)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m1["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_tp.params),
        jax.tree_util.tree_leaves(new1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.05, atol=2e-4
        )


def test_create_train_state_places_tp_layouts(tp_mesh):
    """`mesh: {model: N>1}` in a config is the only switch: create_train_state
    must place column/row TP shardings (not replicate)."""
    from demovlp_tpu.train.state import create_train_state

    model = _model()
    tx = make_optimizer(lr=1e-3)
    st = create_train_state(
        model, tx, _batch(2), jax.random.PRNGKey(0), tp_mesh
    )
    qkv = st.params["params"]["object_model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    mu = st.opt_state.inner_state[0].mu
    assert (
        mu["params"]["text_tower"]["text_model"]["layer_0"]["ffn_lin1"][
            "kernel"
        ].sharding.spec
        == P(None, "model")
    )


def test_checkpoint_reshards_tp_to_replicated(tp_mesh, tmp_path):
    """A checkpoint written from a TP-sharded run must restore into a
    differently-sharded (replicated) topology — elastic production resume
    across mesh shapes."""
    from demovlp_tpu.parallel import replicated_sharding
    from demovlp_tpu.train.checkpoint import CheckpointManager

    model = _model()
    tx = make_optimizer(lr=1e-3)
    params = model.init(jax.random.PRNGKey(0), _batch(2))
    state_tp = shard_state(TrainState.create(params, tx), tp_mesh)

    mgr = CheckpointManager(tmp_path, arch="ObjectRelation")
    mgr.save(state_tp, epoch=1, monitor_best=0.5)

    # template: same pytree, replicated over the full 8-device mesh
    full = create_mesh()
    rep = replicated_sharding(full)
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep)
        if hasattr(x, "shape") and x.ndim > 0
        else x,
        state_tp,
    )
    restored, meta = mgr.restore(mgr.latest(), template)
    assert meta["epoch"] == 1
    qkv = restored.params["params"]["object_model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P()  # replicated now
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state_tp.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_eval_step_accepts_tp_params(tp_mesh):
    """Eval steps must run on TP-committed params (they previously declared
    replicated in_shardings and jit rejected the mismatch — every TP run
    crashed at its first validation)."""
    from demovlp_tpu.train.steps import make_retrieval_eval_step

    model = _model()
    loss = GlobalLocalLoss(
        use_local=True, use_global=True, coef=1.0, focal_type="equal"
    )
    params = model.init(jax.random.PRNGKey(0), _batch(8))
    tx = make_optimizer(lr=1e-3)
    state_tp = shard_state(TrainState.create(params, tx), tp_mesh)

    eval_step = make_retrieval_eval_step(model, loss, tp_mesh)
    out, (total, g, l) = eval_step(
        state_tp.params, shard_batch(_batch(8), tp_mesh)
    )
    assert np.isfinite(float(total))

    # replicated reference value matches
    single = create_mesh(devices=np.array(jax.devices()[:1]))
    eval1 = make_retrieval_eval_step(model, loss, single)
    _, (total1, _, _) = eval1(params, _batch(8))
    np.testing.assert_allclose(float(total), float(total1), rtol=1e-4)


def test_export_script_reads_tp_sharded_checkpoint(tp_mesh, tmp_path):
    """A TP-committed checkpoint exports to the reference torch schema:
    restore_numpy_tree reassembles full (unsharded) host arrays and the
    exported state dict strict-imports back to the original values."""
    import importlib.util
    from pathlib import Path

    from demovlp_tpu.convert import (
        convert_reference_checkpoint,
        export_reference_state_dict,
    )
    from demovlp_tpu.train.checkpoint import CheckpointManager

    model = _model()
    params = model.init(jax.random.PRNGKey(0), _batch(2))
    tx = make_optimizer(lr=1e-3)
    state_tp = shard_state(TrainState.create(params, tx), tp_mesh)
    mgr = CheckpointManager(tmp_path, arch="ObjectRelation")
    mgr.save(state_tp, epoch=1, monitor_best=0.0)

    spec = importlib.util.spec_from_file_location(
        "export_checkpoint", Path("scripts/export_checkpoint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    tree = mod.restore_numpy_tree(mgr.latest())
    exported = export_reference_state_dict(mod.extract_params(tree))

    back = convert_reference_checkpoint(
        exported, num_frames=F, depth=2, n_text_layers=2, strict=True
    )
    want = jax.tree.map(np.asarray, params["params"])
    got = back["params"]
    for path, leaf in jax.tree_util.tree_leaves_with_path(want):
        ref = got
        for k in path:
            ref = ref[k.key]
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path),
        )
