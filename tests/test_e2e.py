"""End-to-end slices on an 8-virtual-device CPU mesh: config -> data ->
model -> jitted SPMD train step -> eval -> metrics -> checkpoint."""
import numpy as np
import pytest

import jax

from demovlp_tpu.config import ConfigParser
from demovlp_tpu.data.loader import RegionDataLoader
from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.tokenizer import SimpleTokenizer
from demovlp_tpu.losses import GlobalLocalLoss, CrossEntropy
from demovlp_tpu.metrics import t2v_metrics, v2t_metrics, evaluate_qa, evaluate_mc
from demovlp_tpu.models import ObjectRelation, ObjectQARelation, ObjectMCRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh
from demovlp_tpu.train import RetrievalTrainer, QATrainer, MCTrainer, make_optimizer

TINY_TEXT = DistilBertConfig(
    vocab_size=30522, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=128,
)

F, K = 2, 4
BS = 8


def _loaders(task="retrieval", n=32, bs=BS, split="train", **obj_kw):
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": F, "object_num": K, "num_samples": n, "task": task,
            **obj_kw,
        },
        split=split,
    )
    return RegionDataLoader(
        ds, batch_size=bs, shuffle=(split == "train"), num_workers=2,
        drop_last=True, process_index=0, process_count=1,
    )


def _config(name="tiny", arch="ObjectRelation", use_local=True, tmp_path="/tmp"):
    return ConfigParser(
        config={
            "name": name,
            "n_gpu": 8,
            "arch": {"type": arch, "args": {}},
            "optimizer": {"type": "AdamW", "args": {"lr": 1e-4}},
            "loss": {
                "type": "GlobalLocalLoss",
                "args": {"use_local": use_local, "use_global": True,
                         "coef": 1.0, "focal_type": "equal"},
            },
            "metrics": ["t2v_metrics", "v2t_metrics"],
            "trainer": {
                "epochs": 1,
                "max_samples_per_epoch": 64,
                "save_dir": str(tmp_path),
                "save_period": 1,
                "monitor": "min val_loss_0",
                "init_val": False,
            },
        },
        test=False,
        timestamp=False,
    )


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


def test_retrieval_train_and_eval(tmp_path, mesh):
    config = _config(tmp_path=tmp_path)
    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True,
                           coef=1.0, focal_type="equal")
    tx = make_optimizer(lr=1e-4)
    trainer = RetrievalTrainer(
        model, loss, [t2v_metrics, v2t_metrics], tx, config, mesh,
        data_loader=[_loaders("retrieval", split="train")],
        valid_data_loader=[_loaders("retrieval", n=24, split="test")],
        tokenizer=SimpleTokenizer(max_length=100),
        max_samples_per_epoch=16,
    )
    log = trainer.train()
    assert np.isfinite(log["loss_0"])
    assert "val_loss_0" in log and np.isfinite(log["val_loss_0"])
    r1 = log["val_0_t2v_metrics_R1"]
    assert 0.0 <= r1 <= 100.0
    # a checkpoint was written
    assert (config.save_dir / "checkpoint-epoch1").exists()
    assert (config.save_dir / "model_best").exists()


def test_retrieval_loss_decreases(tmp_path, mesh):
    """Overfit 2 epochs on 16 samples; loss should drop."""
    config = _config(tmp_path=tmp_path, use_local=False)
    config.config["trainer"]["epochs"] = 2
    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=False, use_global=True,
                           coef=1.0, focal_type="equal")
    tx = make_optimizer(lr=1e-3)
    trainer = RetrievalTrainer(
        model, loss, [t2v_metrics], tx, config, mesh,
        data_loader=[_loaders("retrieval", n=16)],
        valid_data_loader=[],
        tokenizer=SimpleTokenizer(max_length=100),
        max_samples_per_epoch=16,
        lr_mode="config",
    )
    losses = []
    for epoch in (1, 2):
        log = trainer._train_epoch(epoch)
        losses.append(log["loss_0"])
    assert losses[1] < losses[0]


def test_qa_train_and_eval(tmp_path, mesh):
    config = _config("tiny_qa", "ObjectQARelation", tmp_path=tmp_path)
    config.config["loss"] = {"type": "CrossEntropy", "args": {}}
    model = ObjectQARelation(
        object_num=K, num_frames=F, num_label=8, projection_dim=16,
        text_config=TINY_TEXT, object_embed_dim=32, object_depth=2, object_heads=4,
    )
    tx = make_optimizer(lr=1e-4)
    trainer = QATrainer(
        model, CrossEntropy(), [evaluate_qa], tx, config, mesh,
        data_loader=[_loaders("qa", num_label=8)],
        valid_data_loader=[_loaders("qa", n=16, split="test", num_label=8)],
        tokenizer=SimpleTokenizer(max_length=100),
        max_samples_per_epoch=16,
    )
    log = trainer.train()
    assert np.isfinite(log["loss_0"])
    acc = log["val_0_evaluate_qa_overall_acc"]
    assert 0.0 <= acc <= 1.0


def test_mc_eval(tmp_path, mesh):
    config = _config("tiny_mc", "ObjectMCRelation", tmp_path=tmp_path)
    config.config["trainer"]["epochs"] = 0
    model = ObjectMCRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True,
                           coef=1.0, focal_type="equal")
    tx = make_optimizer(lr=1e-4)
    trainer = MCTrainer(
        model, loss, [evaluate_mc], tx, config, mesh,
        data_loader=[],
        valid_data_loader=[_loaders("mc", n=8, bs=1, split="test")],
        tokenizer=SimpleTokenizer(max_length=100),
    )
    log = trainer.train()
    acc = float(log["val_0_evaluate_mc_mc_accuracy"])
    assert 0.0 <= acc <= 100.0


def test_global_negatives_match_single_device(mesh):
    """The sharded train step must produce the same loss/grads as an
    unsharded full-batch computation — i.e. negatives span the mesh."""
    import jax.numpy as jnp
    from demovlp_tpu.train.steps import make_retrieval_train_step
    from demovlp_tpu.train.state import TrainState

    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True,
                           coef=1.0, focal_type="equal")
    rng = jax.random.PRNGKey(0)
    b = 16
    batch = {
        "input_ids": np.tile(np.arange(100, dtype=np.int32), (b, 1)) % 1000 + 1,
        "attention_mask": np.ones((b, 100), np.int32),
        "object": np.random.RandomState(0).randn(b, F, K, 2054).astype(np.float32),
        "object_mask": np.ones((b, F, K), np.float32),
    }
    params = model.init(rng, batch)
    tx = make_optimizer(lr=1e-3)

    # sharded step over the 8-device mesh
    step = make_retrieval_train_step(model, loss, tx, mesh)
    from demovlp_tpu.parallel.mesh import shard_batch

    # both states built BEFORE stepping: the train step donates its input
    # state, which would invalidate `params` for the second init
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
    state1 = TrainState.create(params, tx)

    new_state, m = step(state, shard_batch(batch, mesh), 1e-3, rng)
    sharded_loss = float(m["loss"])

    # single-device full-batch reference
    single_mesh = create_mesh(devices=np.array(jax.devices()[:1]))
    step1 = make_retrieval_train_step(model, loss, tx, single_mesh)
    new_state1, m1 = step1(state1, batch, 1e-3, rng)
    np.testing.assert_allclose(sharded_loss, float(m1["loss"]), rtol=1e-4)

    # updated params agree too (grad reduction == full-batch grad). Adam's
    # first-step update is sign(g)*lr-ish, so tiny cross-device reduction-
    # order noise shows up at ~1e-4 of the 1e-3 update; tolerate that
    # (a real grad bug flips whole updates, i.e. ~2e-3 differences).
    p_a = jax.tree_util.tree_leaves(new_state.params)
    p_b = jax.tree_util.tree_leaves(new_state1.params)
    for a, c in zip(p_a, p_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=0.05, atol=3e-4)


def test_sharded_local_sims_matches_dense(mesh):
    from demovlp_tpu.parallel.sharded_eval import sharded_local_sims
    from demovlp_tpu.ops.xattn import xattn_score
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    ni, nc, r, w, d = 20, 12, 6, 5, 16
    img = rng.randn(ni, r, d).astype(np.float32)
    lang = rng.randn(nc, w, d).astype(np.float32)
    imask = ((rng.rand(ni, r) > 0.2).astype(np.float32) - 1) * 100
    lmask = ((rng.rand(nc, w) > 0.2).astype(np.float32) - 1) * 100
    got = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=2,
        lambda_softmax=20.0, focal_type="equal",
    )
    want = np.asarray(
        xattn_score(jnp.array(img), jnp.array(lang), jnp.array(imask),
                    jnp.array(lmask), 20.0, "equal")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_model_axis_mesh_train_step():
    """The 'model' mesh axis > 1 (TP headroom) actually exercised: the full
    retrieval train step on a (data=4, model=2) mesh must reproduce the
    single-device full-batch loss (params replicated over 'model')."""
    import jax.numpy as jnp
    from demovlp_tpu.train.steps import make_retrieval_train_step
    from demovlp_tpu.train.state import TrainState
    from demovlp_tpu.parallel.mesh import shard_batch

    mesh42 = create_mesh(data=4, model=2)
    assert mesh42.shape["model"] == 2

    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True,
                           coef=1.0, focal_type="equal")
    rng = jax.random.PRNGKey(1)
    b = 8
    batch = {
        "input_ids": np.tile(np.arange(100, dtype=np.int32), (b, 1)) % 1000 + 1,
        "attention_mask": np.ones((b, 100), np.int32),
        "object": np.random.RandomState(1).randn(b, F, K, 2054).astype(np.float32),
        "object_mask": np.ones((b, F, K), np.float32),
    }
    params = model.init(rng, batch)
    tx = make_optimizer(lr=1e-3)
    state42 = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
    state1 = TrainState.create(params, tx)

    step42 = make_retrieval_train_step(model, loss, tx, mesh42)
    _, m42 = step42(state42, shard_batch(batch, mesh42), 1e-3, rng)

    single = create_mesh(devices=np.array(jax.devices()[:1]))
    step1 = make_retrieval_train_step(model, loss, tx, single)
    _, m1 = step1(state1, batch, 1e-3, rng)
    np.testing.assert_allclose(float(m42["loss"]), float(m1["loss"]), rtol=1e-4)


def test_sharded_local_sims_empty_gallery(mesh):
    """0-row gallery (empty/filtered eval split) returns a (0, n_cap) matrix
    instead of crashing the chunk stager."""
    from demovlp_tpu.parallel.sharded_eval import sharded_local_sims

    rng = np.random.RandomState(0)
    nc, r, w, d = 5, 6, 4, 16
    img = np.zeros((0, r, d), np.float32)
    lang = rng.randn(nc, w, d).astype(np.float32)
    imask = np.zeros((0, r), np.float32)
    lmask = np.zeros((nc, w), np.float32)
    got = sharded_local_sims(
        img, lang, imask, lmask, mesh, segment=2,
        lambda_softmax=20.0, focal_type="equal",
    )
    assert got.shape == (0, nc)
