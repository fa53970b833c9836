"""Serving surface (demovlp_tpu/serve.py + scripts/extract_embeddings.py):
the standalone embedding extractor must reproduce the trainer eval
assembly byte-for-byte, cover every sample at any process count, and the
CLI must write a usable npz + top-k results from a shipped smoke config.
(Net-new vs the reference, which has no serving layer — SURVEY.md §1.)"""
from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

import jax

from demovlp_tpu import serve
from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.loader import RegionDataLoader
from demovlp_tpu.data.tokenizer import SimpleTokenizer
from demovlp_tpu.losses import GlobalLocalLoss
from demovlp_tpu.metrics import t2v_metrics, v2t_metrics
from demovlp_tpu.models import ObjectRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh
from demovlp_tpu.train import RetrievalTrainer, make_optimizer

TINY_TEXT = DistilBertConfig(
    vocab_size=30522, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
    max_position_embeddings=128,
)
F, K, BS = 2, 4, 8


def _tiny_model():
    return ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
    )


def _synth_loader(n, process_index=0, process_count=1):
    ds = dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": F, "object_num": K, "num_samples": n,
            "task": "retrieval",
        },
        split="test",
    )
    return RegionDataLoader(
        ds, batch_size=BS, shuffle=False, num_workers=1, drop_last=False,
        process_index=process_index, process_count=process_count,
    )


def _make_trainer(mesh, valid_loader, tmp_path):
    from demovlp_tpu.config import ConfigParser

    config = ConfigParser(
        config={
            "name": "serve-parity",
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
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal")
    train_dl = _synth_loader(16)
    return RetrievalTrainer(
        _tiny_model(), loss, [t2v_metrics, v2t_metrics],
        make_optimizer(lr=1e-4), config, mesh,
        data_loader=[train_dl],
        valid_data_loader=[valid_loader],
        tokenizer=SimpleTokenizer(max_length=100),
        max_samples_per_epoch=16,
    )


def test_embed_loader_matches_trainer_assembly(tmp_path, monkeypatch):
    """serve.embed_loader on the trainer's own params/loader reproduces the
    exact 7 arrays the trainer gathers in _valid_epoch (recorded via the
    same passthrough-monkeypatch used by the multihost eval tests) — so any
    metric computable in the trainer is computable offline."""
    import demovlp_tpu.train.retrieval as retrieval_mod

    n = 20  # ragged: pad tail batch (20 % 8 != 0)
    mesh = create_mesh()
    vdl = _synth_loader(n)
    tr = _make_trainer(mesh, vdl, tmp_path)

    captured = []
    monkeypatch.setattr(
        retrieval_mod, "host_allgather_ragged",
        lambda x: (captured.append(np.asarray(x)), np.asarray(x))[1],
    )
    tr._valid_epoch(0)
    assert len(captured) == len(serve.EMBED_KEYS)

    step = serve.make_embed_step(tr.model, mesh)
    cat, meta = serve.embed_loader(
        step, tr.state.params, vdl, SimpleTokenizer(max_length=100), mesh
    )
    assert len(meta["paths"]) == len(meta["raw_captions"]) == n
    for key, trainer_arr in zip(serve.EMBED_KEYS, captured):
        np.testing.assert_array_equal(cat[key], trainer_arr)


def test_embed_loader_two_process_union(tmp_path):
    """Simulated 2-host extraction (contiguous loader shards + wrap-pad
    validity) concatenates to the single-process result — full coverage in
    dataset order at n % (hosts * batch) != 0."""
    n = 19
    mesh = create_mesh()
    model = _tiny_model()
    tok = SimpleTokenizer(max_length=100)
    dl = _synth_loader(n)
    params = model.init(
        jax.random.PRNGKey(0),
        {
            "input_ids": np.zeros((BS, 100), np.int32),
            "attention_mask": np.ones((BS, 100), np.int32),
            "object": np.zeros((BS, F, K, 2054), np.float32),
            "object_mask": np.ones((BS, F, K), np.float32),
        },
    )
    step = serve.make_embed_step(model, mesh)
    single, meta_single = serve.embed_loader(step, params, dl, tok, mesh)

    shards = []
    metas = []
    for p in range(2):
        cat, meta = serve.embed_loader(
            step, params, _synth_loader(n, process_index=p, process_count=2),
            tok, mesh,
        )
        shards.append(cat)
        metas.append(meta)
    for key in serve.EMBED_KEYS:
        merged = np.concatenate([s[key] for s in shards], axis=0)
        np.testing.assert_array_equal(merged, single[key])
    assert metas[0]["paths"] + metas[1]["paths"] == meta_single["paths"]


def test_embed_loader_bf16_transfer_exact():
    """transfer_dtype=bf16 (halves the H2D bytes of the region tensor) is
    bit-identical for a bf16-compute model: the tower's first op is
    x.astype(bf16), and numpy's RNE f32->bf16 cast matches XLA's convert.
    Also covers the one-batch-in-flight pipelining (same loop)."""
    import jax.numpy as jnp

    n = 19
    mesh = create_mesh()
    model = ObjectRelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
        dtype=jnp.bfloat16,
    )
    tok = SimpleTokenizer(max_length=100)
    params = model.init(
        jax.random.PRNGKey(0),
        {
            "input_ids": np.zeros((BS, 100), np.int32),
            "attention_mask": np.ones((BS, 100), np.int32),
            "object": np.zeros((BS, F, K, 2054), np.float32),
            "object_mask": np.ones((BS, F, K), np.float32),
        },
    )
    step = serve.make_embed_step(model, mesh)
    base, meta_base = serve.embed_loader(step, params, _synth_loader(n), tok, mesh)
    cast, meta_cast = serve.embed_loader(
        step, params, _synth_loader(n), tok, mesh, transfer_dtype=jnp.bfloat16
    )
    assert meta_cast["paths"] == meta_base["paths"]
    for key in serve.EMBED_KEYS:
        np.testing.assert_array_equal(cast[key], base[key])


def test_combined_sims_quirk_and_dedup():
    """use_local sums local(video,text) onto global(text,video) — the
    reference orientation quirk — and mscoco_dedup takes every 5th gallery
    row before scoring."""
    rng = np.random.RandomState(0)
    n, d, r, w = 10, 16, K * F, 7
    cat = {
        "g_t": rng.randn(n, d).astype(np.float32),
        "g_o": rng.randn(n, d).astype(np.float32),
        "l_t": rng.randn(n, w, d).astype(np.float32),
        "l_o": rng.randn(n, r, d).astype(np.float32),
        "o_mask": np.ones((n, r), np.float32),
        "t_mask": np.zeros((n, w), np.float32),
        "t_len": np.full((n,), w, np.int64),
    }
    mesh = create_mesh()
    from demovlp_tpu.ops.similarity import sim_matrix
    from demovlp_tpu.parallel.sharded_eval import sharded_local_sims

    got = serve.combined_sims(cat, mesh, backend="xla", focal_type="equal")
    want = np.asarray(sim_matrix(cat["g_t"], cat["g_o"])) + sharded_local_sims(
        cat["l_o"], cat["l_t"], cat["o_mask"], cat["t_mask"], mesh,
        segment=64, lambda_softmax=20.0, focal_type="equal", backend="xla",
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    glob_only = serve.combined_sims(cat, mesh, use_local=False)
    np.testing.assert_allclose(
        glob_only, np.asarray(sim_matrix(cat["g_t"], cat["g_o"])), rtol=1e-6
    )

    dedup = serve.combined_sims(cat, mesh, use_local=False, mscoco_dedup=True)
    assert dedup.shape == (n, (n + 4) // 5)
    np.testing.assert_allclose(
        dedup,
        np.asarray(sim_matrix(cat["g_t"], cat["g_o"][::5])),
        rtol=1e-6,
    )


def test_topk_retrieval():
    sims = np.array([[0.1, 0.9, 0.5], [0.7, 0.2, 0.3]], np.float32)
    meta = {"paths": ["v0", "v1", "v2"], "raw_captions": ["c0", "c1", "c2"]}
    res = serve.topk_retrieval(
        sims, k=2, query_meta={"raw_captions": ["q0", "q1"]},
        gallery_meta=meta,
    )
    assert res[0]["topk_indices"] == [1, 2]
    assert res[0]["topk_paths"] == ["v1", "v2"]
    assert res[0]["query_caption"] == "q0"
    np.testing.assert_allclose(res[0]["topk_scores"], [0.9, 0.5])
    assert res[1]["topk_indices"] == [0, 2]
    # k larger than the gallery clamps
    assert len(serve.topk_retrieval(sims, k=99)[0]["topk_indices"]) == 3


def test_predict_qa_two_process_union():
    """Offline QA prediction covers every question exactly once, in dataset
    order, and the simulated 2-host union equals the single-process run."""
    from demovlp_tpu.models import ObjectQARelation
    from demovlp_tpu.train.steps import make_qa_eval_step

    n, n_label = 19, 10
    mesh = create_mesh()
    model = ObjectQARelation(
        object_num=K, num_frames=F, projection_dim=16, text_config=TINY_TEXT,
        object_embed_dim=32, object_depth=2, object_heads=4,
        num_label=n_label,
    )
    tok = SimpleTokenizer(max_length=100)

    def qa_loader(process_index=0, process_count=1):
        ds = dataset_object_loader(
            "SyntheticObjectSelect",
            text_params={},
            object_params={
                "num_frames": F, "object_num": K, "num_samples": n,
                "task": "qa", "num_label": n_label,
            },
            split="test",
        )
        return RegionDataLoader(
            ds, batch_size=BS, shuffle=False, num_workers=1, drop_last=False,
            process_index=process_index, process_count=process_count,
        )

    dl = qa_loader()
    params = model.init(
        jax.random.PRNGKey(0),
        {
            "input_ids": np.zeros((BS, 100), np.int32),
            "attention_mask": np.ones((BS, 100), np.int32),
            "object": np.zeros((BS, F, K, 2054), np.float32),
            "object_mask": np.ones((BS, F, K), np.float32),
        },
    )
    step = make_qa_eval_step(model, mesh)
    single = serve.predict_qa(
        step, params, dl, tok, mesh, label2ans=dl.dataset.label2ans
    )
    assert [r["question_id"] for r in single] == list(range(n))
    assert all(0 <= r["answer"] < n_label for r in single)
    assert all(r["answer_text"] == f"ans{r['answer']}" for r in single)

    merged = []
    for p in range(2):
        merged += serve.predict_qa(
            step, params, qa_loader(p, 2), tok, mesh,
            label2ans=dl.dataset.label2ans,
        )
    assert merged == single


def test_predict_qa_cli(tmp_path, monkeypatch):
    """scripts/predict_qa.py end-to-end on the shipped QA smoke config."""
    cfg = json.loads(Path("configs/smoke/synthetic_qa.json").read_text())
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    spec = importlib.util.spec_from_file_location(
        "predict_qa", "scripts/predict_qa.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = tmp_path / "pred.json"
    monkeypatch.setattr(
        "sys.argv",
        ["predict_qa.py", "-c", str(cfg_path), "--split", "test",
         "--output", str(out)],
    )
    mod.main()
    results = json.loads(out.read_text())
    assert len(results) > 0
    assert all(
        set(r) == {"question_id", "answer", "answer_text"} for r in results
    )
    qids = [r["question_id"] for r in results]
    assert qids == sorted(set(qids))  # full coverage, no duplicates


def test_combined_sims_default_matches_loss_default():
    """serve.combined_sims' focal_type default must equal the loss-class
    default ('prob', losses/losses.py + reference model/loss.py:15): a
    config omitting loss.args.focal_type trains AND serves with the same
    relevance indicator."""
    import inspect

    default = inspect.signature(serve.combined_sims).parameters[
        "focal_type"
    ].default
    assert default == GlobalLocalLoss().focal_type == "prob"


def test_extract_embeddings_cli_mscoco_dedup(tmp_path, monkeypatch):
    """Under the MSCOCO every-5th-row gallery dedup, topk_paths must come
    from the DEDUPED gallery (paths[5*i], not paths[i]) and topk_indices
    must be mapped back to saved-npz row coordinates (multiples of 5)."""
    cfg = json.loads(
        Path("configs/smoke/synthetic_retrieval.json").read_text()
    )
    cfg["name"] = "MSCOCO_smoke"
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    spec = importlib.util.spec_from_file_location(
        "extract_embeddings", "scripts/extract_embeddings.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = tmp_path / "emb.npz"
    res = tmp_path / "results.json"
    monkeypatch.setattr(
        "sys.argv",
        [
            "extract_embeddings.py", "-c", str(cfg_path), "--split", "test",
            "--output", str(out), "--topk", "2", "--results", str(res),
        ],
    )
    mod.main()

    data = np.load(out, allow_pickle=False)
    n = data["g_t"].shape[0]
    paths = [str(p) for p in data["paths"]]
    results = json.loads(res.read_text())
    assert len(results) == n  # queries stay undeduped
    for r in results:
        # indices are in SAVED-npz coordinates: multiples of 5, in range
        assert all(i % 5 == 0 and 0 <= i < n for i in r["topk_indices"])
        # and the attached paths are the deduped-gallery rows they index
        assert r["topk_paths"] == [paths[i] for i in r["topk_indices"]]


def test_extract_embeddings_cli(tmp_path, monkeypatch):
    """scripts/extract_embeddings.py end-to-end on the shipped smoke config:
    writes an npz with all EMBED_KEYS + metadata and a top-k results JSON
    whose indices agree with the saved embeddings."""
    cfg = json.loads(
        Path("configs/smoke/synthetic_retrieval.json").read_text()
    )
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    spec = importlib.util.spec_from_file_location(
        "extract_embeddings", "scripts/extract_embeddings.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = tmp_path / "emb.npz"
    res = tmp_path / "results.json"
    monkeypatch.setattr(
        "sys.argv",
        [
            "extract_embeddings.py", "-c", str(cfg_path), "--split", "test",
            "--output", str(out), "--topk", "3", "--results", str(res),
        ],
    )
    mod.main()

    data = np.load(out, allow_pickle=False)
    for key in serve.EMBED_KEYS:
        assert key in data, key
    n = data["g_t"].shape[0]
    assert n == data["g_o"].shape[0] == len(data["raw_captions"])
    results = json.loads(res.read_text())
    assert len(results) == n
    assert all(len(r["topk_indices"]) == 3 for r in results)
    assert all(0 <= i < n for r in results for i in r["topk_indices"])
