"""Batched MC eval (B items x n_options per sharded dispatch) must produce
exactly the predictions of the reference-shaped batch-1 path
(train/steps.py make_mc_eval_step_batched vs make_mc_eval_step)."""
import numpy as np
import pytest

from demovlp_tpu.config import ConfigParser
from demovlp_tpu.data.loader import RegionDataLoader
from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.tokenizer import SimpleTokenizer
from demovlp_tpu.losses import GlobalLocalLoss
from demovlp_tpu.metrics import evaluate_mc
from demovlp_tpu.models import ObjectMCRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh
from demovlp_tpu.train import MCTrainer, make_optimizer

TINY_TEXT = DistilBertConfig(
    vocab_size=30522, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=128,
)
F, K = 2, 4


def _mc_loader(n):
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": F, "object_num": K, "num_samples": n, "task": "mc",
        },
        split="test",
    )
    return RegionDataLoader(
        ds, batch_size=1, shuffle=False, num_workers=2,
        drop_last=False, process_index=0, process_count=1,
    )


def _trainer(tmp_path, mc_eval_batch, n_items):
    config = ConfigParser(
        config={
            "name": f"tiny_mc_b{mc_eval_batch}",
            "arch": {"type": "ObjectMCRelation", "args": {}},
            "optimizer": {"type": "AdamW", "args": {"lr": 1e-4}},
            "loss": {"type": "GlobalLocalLoss", "args": {}},
            "metrics": ["evaluate_mc"],
            "trainer": {
                "epochs": 0,
                "save_dir": str(tmp_path),
                "init_val": False,
                "mc_eval_batch": mc_eval_batch,
            },
        },
        test=False,
        timestamp=False,
    )
    model = ObjectMCRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True,
                           coef=1.0, focal_type="equal")
    return MCTrainer(
        model, loss, [evaluate_mc], make_optimizer(lr=1e-4), config,
        create_mesh(),
        data_loader=[],
        valid_data_loader=[_mc_loader(n_items)],
        tokenizer=SimpleTokenizer(max_length=100),
        rng_seed=7,
    )


def test_batched_matches_single(tmp_path):
    """11 items exercises a full group + a padded tail; the prediction dict
    and accuracy must equal the batch-1 path's exactly (same rng_seed ->
    identical params). mc_eval_batch=4 is rounded up to the 8-device data
    axis so each dispatch shards evenly."""
    import jax

    t1 = _trainer(tmp_path / "a", mc_eval_batch=1, n_items=11)
    tb = _trainer(tmp_path / "b", mc_eval_batch=4, n_items=11)
    assert tb.mc_eval_batch == 8  # rounded up to the data-axis size

    params1 = t1.state.params
    # same rng_seed => identical init across the two trainers
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params1)[0]),
        np.asarray(jax.tree_util.tree_leaves(tb.state.params)[0]),
    )

    log1 = t1.train()
    logb = tb.train()
    acc1 = float(log1["val_0_evaluate_mc_mc_accuracy"])
    accb = float(logb["val_0_evaluate_mc_mc_accuracy"])
    assert acc1 == accb

    # compare raw scores item-by-item between the two step functions
    B = tb.mc_eval_batch
    dl = _mc_loader(B)
    from demovlp_tpu.parallel.mesh import shard_batch
    from demovlp_tpu.train.steps import make_mc_eval_step, prepare_batch

    single = make_mc_eval_step(t1.model, t1.loss, t1.mesh)
    groups = []
    for data in dl:
        arrays = prepare_batch(data, t1.tokenizer)
        arrays.pop("label", None)
        arrays.pop("sample_valid", None)
        n_opt = arrays["input_ids"].shape[0]
        arrays["object"] = np.repeat(data["object"], n_opt, axis=0)
        arrays["object_mask"] = np.repeat(data["object_mask"], n_opt, axis=0)
        groups.append(arrays)
    want = np.stack(
        [np.asarray(single(params1, g)) for g in groups]
    )  # (B, n_opt)
    batch = {
        k: np.stack([g[k] for g in groups])
        for k in ("input_ids", "attention_mask", "object", "object_mask")
    }
    got = np.asarray(tb._eval_step(params1, shard_batch(batch, tb.mesh)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    assert (got.argmax(axis=1) == want.argmax(axis=1)).all()
