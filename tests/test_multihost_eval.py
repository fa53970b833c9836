"""Multi-host eval correctness: every val sample is evaluated exactly once
at any process count, in dataset order, and pad/duplicate rows never leak
into the monitored val loss.

The reference's DistributedSampler(drop_last=True) silently truncates eval
to a multiple of the world size (base/base_data_loader.py:23-28) and its
padded-batch case never arises; this framework instead wrap-pads each
host's contiguous ceil-share with validity flags (data/loader.py
_host_indices), masks those rows out of the in-jit eval loss
(losses.py valid=), and merges with a ragged host gather
(parallel/mesh.py host_allgather_ragged). Simulated multi-process tests
run the REAL loaders/trainer eval path with process_index/process_count
overridden (no second host needed — JAX's CPU mesh is process-local)."""
from __future__ import annotations

import numpy as np
import pytest

import jax

from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.loader import RegionDataLoader
from demovlp_tpu.data.tokenizer import SimpleTokenizer
from demovlp_tpu.losses import GlobalLocalLoss, NormSoftmaxLoss, RWALoss
from demovlp_tpu.metrics import t2v_metrics, v2t_metrics
from demovlp_tpu.models import ObjectRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh
from demovlp_tpu.parallel.mesh import host_allgather_ragged
from demovlp_tpu.train import RetrievalTrainer, make_optimizer

TINY_TEXT = DistilBertConfig(
    vocab_size=30522, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=128,
)
F, K, BS = 2, 4, 8


# ---------------------------------------------------------------- losses
def _local_fixture(rng, b, r=6, w=5, d=16):
    im = rng.randn(b, r, d).astype(np.float32)
    s = rng.randn(b, w, d).astype(np.float32)
    im_m = np.zeros((b, r), np.float32)
    s_m = np.zeros((b, w), np.float32)
    im_m[:, 4:] = -100.0
    s_m[:, 3:] = -100.0
    sim = np.tanh(rng.randn(b, b)).astype(np.float32)
    return sim, im, s, im_m, s_m


@pytest.mark.parametrize("focal_type", ["equal", "prob"])
def test_masked_losses_equal_sliced(focal_type):
    """loss(padded batch, valid mask) == loss(valid rows alone), exactly the
    semantics eval needs for its shape-padded tail batches."""
    rng = np.random.RandomState(0)
    b, n = 8, 5
    sim, im, s, im_m, s_m = _local_fixture(rng, b)
    valid = (np.arange(b) < n).astype(np.float32)

    g = NormSoftmaxLoss()
    np.testing.assert_allclose(
        float(g(sim, valid)), float(g(sim[:n, :n])), rtol=1e-6
    )

    l = RWALoss(focal_type=focal_type)
    masked = float(l(im, s, im_m, None, s_m, valid=valid))
    sliced = float(l(im[:n], s[:n], im_m[:n], None, s_m[:n]))
    np.testing.assert_allclose(masked, sliced, rtol=1e-5)
    assert np.isfinite(masked)

    gl = GlobalLocalLoss(focal_type=focal_type)
    m_tot, m_g, m_l = gl(sim, im, s, im_m, None, s_m, valid=valid)
    s_tot, s_g, s_l = gl(sim[:n, :n], im[:n], s[:n], im_m[:n], None, s_m[:n])
    np.testing.assert_allclose(float(m_tot), float(s_tot), rtol=1e-5)
    np.testing.assert_allclose(float(m_g), float(s_g), rtol=1e-5)
    np.testing.assert_allclose(float(m_l), float(s_l), rtol=1e-5)


def test_masked_loss_all_valid_is_noop():
    rng = np.random.RandomState(1)
    sim, im, s, im_m, s_m = _local_fixture(rng, 8)
    ones = np.ones(8, np.float32)
    gl = GlobalLocalLoss(focal_type="equal")
    a = gl(sim, im, s, im_m, None, s_m)
    b = gl(sim, im, s, im_m, None, s_m, valid=ones)
    for x, y in zip(a, b):
        np.testing.assert_allclose(float(x), float(y), rtol=1e-6)


# ------------------------------------------------------------ ragged gather
def _fake_allgather_factory(shards_per_call):
    """Simulate P processes: each call receives the 'local' array of one
    process; the test drives the gather once per process and the fake
    returns the concatenation of what every process would contribute."""

    def fake(x):
        return np.concatenate(shards_per_call.pop(0), axis=0)

    return fake


def test_host_allgather_ragged_unequal_counts():
    rng = np.random.RandomState(2)
    shards = [rng.randn(4, 3).astype(np.float32),
              rng.randn(3, 3).astype(np.float32),
              rng.randn(3, 3).astype(np.float32)]
    cap = 4
    padded = [
        np.concatenate([s, np.zeros((cap - len(s), 3), np.float32)])
        if len(s) < cap else s
        for s in shards
    ]
    calls = [
        [np.asarray([[len(s)]], np.int64).reshape(1) for s in shards],
        padded,
    ]
    out = host_allgather_ragged(
        shards[0], allgather=_fake_allgather_factory(calls)
    )
    np.testing.assert_array_equal(out, np.concatenate(shards, axis=0))


# ------------------------------------------------------------------ loader
def _synth_ds(n, task="retrieval"):
    return dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": F, "object_num": K, "num_samples": n, "task": task,
        },
        split="test",
    )


@pytest.mark.parametrize("n,pc", [(24, 1), (23, 2), (21, 3), (10, 4), (3, 8)])
def test_eval_loader_covers_all_samples(n, pc):
    """Union over hosts = every sample exactly once, in dataset order;
    every host has the same batch count and per-batch shapes."""
    ds = _synth_ds(n)
    loaders = [
        RegionDataLoader(
            ds, batch_size=4, shuffle=False, num_workers=1, drop_last=False,
            process_index=p, process_count=pc,
        )
        for p in range(pc)
    ]
    assert len({len(dl) for dl in loaders}) == 1  # equal batch counts
    seen = []
    for dl in loaders:
        idx, valid = dl._host_indices()
        assert len(idx) == -(-n // pc)  # equal ceil share
        if valid is None:
            seen.extend(idx.tolist())
        else:
            seen.extend(np.asarray(idx)[valid].tolist())
    assert seen == list(range(n))  # full coverage, original order


def test_eval_loader_batches_carry_validity():
    n, pc = 21, 4  # share 6: host 3 gets 3 real + 3 wrap-pads
    ds = _synth_ds(n)
    dl = RegionDataLoader(
        ds, batch_size=4, shuffle=False, num_workers=1, drop_last=False,
        process_index=3, process_count=pc,
    )
    batches = list(dl)
    assert len(batches) == len(dl) == 2
    v = np.concatenate([b["sample_valid"] for b in batches])
    assert v.tolist() == [1, 1, 1, 0, 0, 0]
    # hosts before the remainder carry all-ones flags (same batch STRUCTURE)
    dl0 = RegionDataLoader(
        ds, batch_size=4, shuffle=False, num_workers=1, drop_last=False,
        process_index=0, process_count=pc,
    )
    b0 = list(dl0)
    assert all("sample_valid" in b for b in b0)
    assert np.concatenate([b["sample_valid"] for b in b0]).all()


def test_train_loader_sharding_unchanged():
    """drop_last (train) keeps the reference DistributedSampler semantics:
    strided equal floor-share, no validity flags."""
    ds = _synth_ds(23)
    dl = RegionDataLoader(
        ds, batch_size=4, shuffle=False, num_workers=1, drop_last=True,
        process_index=1, process_count=2,
    )
    idx, valid = dl._host_indices()
    assert valid is None
    np.testing.assert_array_equal(idx, np.arange(23)[:22][1::2])
    batches = list(dl)
    assert all("sample_valid" not in b for b in batches)


# --------------------------------------------------- trainer eval assembly
def _make_trainer(mesh, valid_loader, tmp_path):
    from demovlp_tpu.config import ConfigParser

    config = ConfigParser(
        config={
            "name": "multihost-eval",
            "n_gpu": 8,
            "arch": {"type": "ObjectRelation", "args": {}},
            "optimizer": {"type": "AdamW", "args": {"lr": 1e-4}},
            "loss": {
                "type": "GlobalLocalLoss",
                "args": {"use_local": True, "use_global": True,
                         "coef": 1.0, "focal_type": "equal"},
            },
            "metrics": ["t2v_metrics", "v2t_metrics"],
            "trainer": {
                "epochs": 1,
                "max_samples_per_epoch": 16,
                "save_dir": str(tmp_path),
                "save_period": 1,
                "monitor": "min val_loss_0",
                "init_val": False,
            },
        },
        test=False,
        timestamp=False,
    )
    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal")
    train_dl = RegionDataLoader(
        _synth_ds(16, "retrieval"), batch_size=BS, shuffle=True,
        num_workers=1, drop_last=True, process_index=0, process_count=1,
    )
    return RetrievalTrainer(
        model, loss, [t2v_metrics, v2t_metrics], make_optimizer(lr=1e-4),
        config, mesh,
        data_loader=[train_dl],
        valid_data_loader=[valid_loader],
        tokenizer=SimpleTokenizer(max_length=100),
        max_samples_per_epoch=16,
    )


def test_two_process_eval_assembly_matches_single(tmp_path, monkeypatch):
    """Run the REAL RetrievalTrainer._valid_epoch once per simulated host
    (loaders sharded process_index=0/1 of 2) and once single-process over a
    20-sample val set (20 % (2 hosts * 8 batch) != 0 twice over: ragged
    host shares AND a padded tail batch). The per-host embedding shards,
    concatenated in process order, must equal the single-process assembly
    byte for byte — so gather+metrics see the identical full val set."""
    import demovlp_tpu.train.retrieval as retrieval_mod

    n = 20
    mesh = create_mesh()

    captured = []

    def record_passthrough(x):
        captured.append(np.asarray(x))
        return np.asarray(x)

    monkeypatch.setattr(
        retrieval_mod, "host_allgather_ragged", record_passthrough
    )

    def run(process_index, process_count):
        captured.clear()
        vdl = RegionDataLoader(
            _synth_ds(n), batch_size=BS, shuffle=False, num_workers=1,
            drop_last=False, process_index=process_index,
            process_count=process_count,
        )
        tr = _make_trainer(mesh, vdl, tmp_path)
        res = tr._valid_epoch(0)
        # 7 gathered arrays per loader: g_t, g_o, l_t, l_o, o_mask, t_mask, t_len
        return list(captured), res

    single, res_single = run(0, 1)
    host0, _ = run(0, 2)
    host1, _ = run(1, 2)

    assert len(single) == len(host0) == len(host1) == 7
    for s, a, b in zip(single, host0, host1):
        assert len(a) + len(b) == len(s) == n
        np.testing.assert_array_equal(np.concatenate([a, b], axis=0), s)

    # single-process metrics over the full 20 samples are the ground truth
    r1 = res_single["nested_val_metrics"][0]["t2v_metrics"]["R1"]
    assert 0.0 <= r1 <= 100.0


def test_padded_tail_batch_val_loss_excludes_pads(tmp_path):
    """The monitored val_loss must equal the loss over the REAL rows of the
    tail batch: eval step on an 8-padded 5-row batch (valid mask) vs the
    unpadded 5-row batch on a single-device mesh."""
    from demovlp_tpu.train.steps import make_retrieval_eval_step
    from demovlp_tpu.train.state import create_train_state
    from demovlp_tpu.parallel.mesh import shard_batch

    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal")
    rng = np.random.RandomState(3)
    n, b = 5, 8
    batch5 = {
        "input_ids": rng.randint(1, 1000, size=(n, 12)).astype(np.int32),
        "attention_mask": np.ones((n, 12), np.int32),
        "object": rng.randn(n, F, K, 2054).astype(np.float32),
        "object_mask": np.ones((n, F, K), np.float32),
    }
    batch8 = {
        k: np.concatenate([v, np.repeat(v[:1], b - n, axis=0)])
        for k, v in batch5.items()
    }
    batch8["valid"] = (np.arange(b) < n).astype(np.float32)

    mesh8 = create_mesh()
    mesh1 = create_mesh(devices=np.array(jax.devices()[:1]))
    tx = make_optimizer(lr=1e-4)
    state = create_train_state(
        model, tx, batch8, jax.random.PRNGKey(0), mesh8
    )

    step8 = make_retrieval_eval_step(model, loss, mesh8)
    _, (l8, g8, loc8) = step8(state.params, shard_batch(batch8, mesh8))

    state1 = create_train_state(
        model, tx, batch5, jax.random.PRNGKey(0), mesh1
    )
    step5 = make_retrieval_eval_step(model, loss, mesh1)
    _, (l5, g5, loc5) = step5(state1.params, shard_batch(batch5, mesh1))

    np.testing.assert_allclose(float(l8), float(l5), rtol=1e-5)
    np.testing.assert_allclose(float(g8), float(g5), rtol=1e-5)
    np.testing.assert_allclose(float(loc8), float(loc5), rtol=1e-5)


def test_host_allgather_pylist_unequal_counts():
    """String metadata gather: three processes with different list lengths
    (incl. an empty one) concatenate in process order — rows line up with
    host_allgather_ragged'ed embeddings."""
    import json

    from demovlp_tpu.parallel.mesh import host_allgather_pylist

    lists = [["a/b.mp4", "a caption, with commas"],
             ["unicode \u00e9\u00e8"], []]
    payloads = [np.frombuffer(json.dumps(l).encode("utf-8"), np.uint8)
                for l in lists]
    cap = max(p.size for p in payloads)
    padded = [np.concatenate([p, np.zeros(cap - p.size, np.uint8)])
              for p in payloads]
    calls = [
        [np.asarray([p.size], np.int64) for p in payloads],
        padded,
    ]
    out = host_allgather_pylist(
        lists[0], allgather=_fake_allgather_factory(calls)
    )
    assert out == [x for l in lists for x in l]
