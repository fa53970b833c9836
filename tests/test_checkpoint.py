"""Checkpoint save/restore roundtrip + best-copy + resume semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demovlp_tpu.train import CheckpointManager, TrainState, make_optimizer


def _tiny_state(seed=0):
    rng = np.random.RandomState(seed)
    params = {
        "params": {
            "dense": {"kernel": jnp.array(rng.randn(4, 3), jnp.float32),
                      "bias": jnp.zeros(3)},
        }
    }
    tx = make_optimizer(lr=1e-3)
    return TrainState.create(params, tx), tx


def test_save_restore_roundtrip(tmp_path):
    state, tx = _tiny_state()
    mgr = CheckpointManager(tmp_path, arch="Tiny", config={"optimizer": {"type": "AdamW"}})
    mgr.save(state, epoch=3, monitor_best=0.5, save_best=True)
    mgr.wait()  # save() is async by default; wait() commits dir + marker
    assert (tmp_path / "checkpoint-epoch3").exists()
    assert (tmp_path / "model_best").exists()

    template, _ = _tiny_state(seed=1)  # different values, same structure
    restored, meta = mgr.restore(tmp_path / "checkpoint-epoch3", template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state.params["params"]["dense"]["kernel"]),
    )
    assert meta["epoch"] == 3
    assert meta["monitor_best"] == 0.5
    assert meta["arch"] == "Tiny"


def test_latest_checkpoint(tmp_path):
    state, _ = _tiny_state()
    mgr = CheckpointManager(tmp_path)
    assert mgr.latest() is None
    mgr.save(state, epoch=1, monitor_best=1.0)
    mgr.save(state, epoch=10, monitor_best=0.9)
    mgr.save(state, epoch=2, monitor_best=0.95)
    assert mgr.latest().name == "checkpoint-epoch10"


def test_overwrite_same_epoch(tmp_path):
    state, _ = _tiny_state()
    mgr = CheckpointManager(tmp_path)
    mgr.save(state, epoch=1, monitor_best=1.0)
    mgr.save(state, epoch=1, monitor_best=0.8)  # re-save same epoch works
    _, meta = mgr.restore(tmp_path / "checkpoint-epoch1", state)
    assert meta["monitor_best"] == 0.8


def test_async_save_commit_marker(tmp_path):
    """Async saves finalize on a waiter thread; wait()/latest()/restore()
    commit them. meta.json is the commit marker: latest() never returns a
    directory that lacks it."""
    state, _ = _tiny_state()
    mgr = CheckpointManager(tmp_path, arch="Tiny", async_save=True)
    mgr.save(state, epoch=1, monitor_best=1.0, save_best=True)
    # latest() must implicitly wait and then see the committed checkpoint
    latest = mgr.latest()
    assert latest is not None and latest.name == "checkpoint-epoch1"
    assert (latest / "meta.json").exists()
    assert (tmp_path / "model_best" / "meta.json").exists()


def test_incomplete_checkpoint_ignored_and_resaveable(tmp_path):
    """A kill can leave a finalized orbax dir WITHOUT the meta.json commit
    marker, or a stale .orbax-checkpoint-tmp dir. latest() must skip both,
    and a re-save of the same epoch must clear them and succeed."""
    state, _ = _tiny_state()
    mgr = CheckpointManager(tmp_path, arch="Tiny")
    mgr.save(state, epoch=1, monitor_best=1.0)
    assert mgr.latest().name == "checkpoint-epoch1"

    # simulate a kill after orbax committed epoch 2 but before the marker
    import shutil

    shutil.copytree(tmp_path / "checkpoint-epoch1", tmp_path / "checkpoint-epoch2")
    (tmp_path / "checkpoint-epoch2" / "meta.json").unlink()
    # ... and a kill mid-write of epoch 3
    (tmp_path / "checkpoint-epoch3.orbax-checkpoint-tmp").mkdir()

    assert mgr.latest().name == "checkpoint-epoch1"

    # relaunched run redoes epoch 2: the stale dirs must not break the save
    mgr2 = CheckpointManager(tmp_path, arch="Tiny")
    mgr2.save(state, epoch=2, monitor_best=0.9)
    mgr2.save(state, epoch=3, monitor_best=0.8)
    assert mgr2.latest().name == "checkpoint-epoch3"
    _, meta = mgr2.restore(tmp_path / "checkpoint-epoch2", state)
    assert meta["monitor_best"] == 0.9


def test_export_script_numpy_restore_and_extract(tmp_path):
    """scripts/export_checkpoint.py: topology-free numpy restore of a
    TrainState checkpoint + params extraction (the .pth write itself is
    covered by test_torch_export.py)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "export_checkpoint", Path("scripts/export_checkpoint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    state, _ = _tiny_state(seed=2)
    mgr = CheckpointManager(tmp_path, arch="Tiny")
    mgr.save(state, epoch=1, monitor_best=0.0)
    mgr.wait()  # reading the dir via an external function, not mgr.restore

    tree = mod.restore_numpy_tree(tmp_path / "checkpoint-epoch1")
    params = mod.extract_params(tree)
    assert set(params) == {"params"}
    np.testing.assert_array_equal(
        params["params"]["dense"]["kernel"],
        np.asarray(state.params["params"]["dense"]["kernel"]),
    )
    # every leaf is host numpy (no device/topology dependence)
    assert all(
        isinstance(leaf, np.ndarray)
        for leaf in jax.tree_util.tree_leaves(tree)
    )


def test_pack_small_state_checkpoint_roundtrip(tmp_path):
    """PackedState optimizer state (big-leaf tuple + packed flat vector)
    survives orbax save/restore — the resume path for pack_small runs."""
    import optax

    rng = np.random.RandomState(0)
    params = {
        "params": {
            "dense": {"kernel": jnp.array(rng.randn(64, 48), jnp.float32),
                      "bias": jnp.array(rng.randn(48), jnp.float32)},
            "ln": {"scale": jnp.array(rng.randn(48), jnp.float32)},
        }
    }
    tx = make_optimizer(lr=1e-3, pack_small=True)
    state = TrainState.create(params, tx)
    # take one real update so mu/nu are non-trivial
    grads = jax.tree.map(lambda l: jnp.ones_like(l) * 0.1, params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state.replace(
        params=optax.apply_updates(state.params, updates),
        opt_state=opt_state,
        step=state.step + 1,
    )

    mgr = CheckpointManager(tmp_path, arch="Tiny")
    mgr.save(state, epoch=1, monitor_best=0.0)
    template = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), tx
    ).replace(step=jnp.zeros_like(state.step))
    restored, _ = mgr.restore(tmp_path / "checkpoint-epoch1", template)

    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state keeps training
    updates2, _ = tx.update(grads, restored.opt_state, restored.params)
    assert np.isfinite(
        np.asarray(updates2["params"]["dense"]["kernel"])
    ).all()
