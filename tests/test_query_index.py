"""Query-side serving (serve.make_text_embed_step / embed_texts /
query_retrieval / load_index + scripts/query_index.py): ad-hoc free-text
queries against a prebuilt video-embedding index must score EXACTLY as the
trainer scores eval. Net-new vs the reference, which cannot run its text
tower outside a full paired forward (model/model.py compute_text is only
reached from forward())."""
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
from demovlp_tpu.models import ObjectRelation
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh

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


def _synth_loader(n):
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
    )


@pytest.fixture(scope="module")
def extracted():
    """One tiny-model extraction shared by the query tests."""
    n = 13
    mesh = create_mesh()
    model = _tiny_model()
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
    cat, meta = serve.embed_loader(step, params, _synth_loader(n), tok, mesh)
    return dict(mesh=mesh, model=model, tok=tok, params=params, cat=cat,
                meta=meta, n=n)


def test_embed_texts_matches_full_forward(extracted):
    """The text-only step on the split's own captions reproduces the text
    side of the full-forward extraction (same tower, same params), and the
    chunked path (batch_size < n, padded tail) equals the one-shot path."""
    e = extracted
    queries = e["meta"]["raw_captions"]
    text_step = serve.make_text_embed_step(e["model"], e["mesh"])
    q = serve.embed_texts(
        text_step, e["params"], queries, e["tok"], e["mesh"]
    )
    assert q["g_t"].shape[0] == e["n"]
    np.testing.assert_allclose(q["g_t"], e["cat"]["g_t"], atol=1e-5)
    np.testing.assert_allclose(q["l_t"], e["cat"]["l_t"], atol=1e-5)
    np.testing.assert_array_equal(q["t_mask"], e["cat"]["t_mask"])

    chunked = serve.embed_texts(
        text_step, e["params"], queries, e["tok"], e["mesh"], batch_size=4
    )
    # different batch shapes compile different executables — XLA tiling
    # noise only, never a row swap
    np.testing.assert_allclose(chunked["g_t"], q["g_t"], atol=1e-5)
    np.testing.assert_allclose(chunked["l_t"], q["l_t"], atol=1e-5)
    np.testing.assert_array_equal(chunked["t_mask"], q["t_mask"])


def test_query_retrieval_matches_combined_sims(extracted):
    """query_retrieval on the split's own captions reproduces the full
    (text, video) scoring matrix row by row. Expected = global cosine +
    transposed local sims — the non-square convention (PARITY.md #16; the
    reference's square-only elementwise quirk sum is undefined for
    query-vs-gallery matrices)."""
    from demovlp_tpu.ops.similarity import sim_matrix
    from demovlp_tpu.parallel.sharded_eval import sharded_local_sims

    e = extracted
    n = e["n"]
    want = np.asarray(
        sim_matrix(e["cat"]["g_t"], e["cat"]["g_o"])
    ) + sharded_local_sims(
        e["cat"]["l_o"], e["cat"]["l_t"], e["cat"]["o_mask"],
        e["cat"]["t_mask"], e["mesh"],
        segment=64, lambda_softmax=20.0, focal_type="equal", backend="xla",
    ).T
    text_step = serve.make_text_embed_step(e["model"], e["mesh"])
    results = serve.query_retrieval(
        text_step, e["params"], e["meta"]["raw_captions"], e["tok"],
        e["cat"], e["mesh"], k=n, focal_type="equal", backend="xla",
        gallery_meta=e["meta"],
    )
    assert len(results) == n
    for qi, r in enumerate(results):
        got_row = np.empty(n, np.float32)
        got_row[r["topk_indices"]] = r["topk_scores"]
        np.testing.assert_allclose(got_row, want[qi], atol=1e-4)
        assert r["topk_paths"] == [
            e["meta"]["paths"][i] for i in r["topk_indices"]
        ]
        assert r["query_caption"] == e["meta"]["raw_captions"][qi]


def test_query_retrieval_global_only_and_empty():
    """use_local=False needs only g_o; empty query lists are rejected."""
    rng = np.random.RandomState(0)
    n, d = 10, 16
    mesh = create_mesh()
    model = _tiny_model()
    tok = SimpleTokenizer(max_length=100)
    params = model.init(
        jax.random.PRNGKey(1),
        {
            "input_ids": np.zeros((BS, 100), np.int32),
            "attention_mask": np.ones((BS, 100), np.int32),
            "object": np.zeros((BS, F, K, 2054), np.float32),
            "object_mask": np.ones((BS, F, K), np.float32),
        },
    )
    text_step = serve.make_text_embed_step(model, mesh)
    gallery = {"g_o": rng.randn(n, d).astype(np.float32)}
    res = serve.query_retrieval(
        text_step, params, ["a dog", "a cat"], tok, gallery, mesh,
        k=3, use_local=False,
    )
    assert len(res) == 2 and all(len(r["topk_indices"]) == 3 for r in res)
    with pytest.raises(ValueError):
        serve.embed_texts(text_step, params, [], tok, mesh)


def test_query_retrieval_mscoco_dedup(extracted):
    """Under MSCOCO dedup, scoring uses every 5th gallery row; returned
    topk_indices are mapped back to undeduped npz coordinates and
    topk_paths index the deduped gallery (extraction-CLI contract)."""
    e = extracted
    text_step = serve.make_text_embed_step(e["model"], e["mesh"])
    res = serve.query_retrieval(
        text_step, e["params"], e["meta"]["raw_captions"][:2], e["tok"],
        e["cat"], e["mesh"], k=2, focal_type="equal", backend="xla",
        mscoco_dedup=True, gallery_meta=e["meta"],
    )
    n = e["n"]
    for r in res:
        assert all(i % 5 == 0 and 0 <= i < n for i in r["topk_indices"])
        assert r["topk_paths"] == [
            e["meta"]["paths"][i] for i in r["topk_indices"]
        ]


def test_load_index_roundtrip(tmp_path, extracted):
    """np.savez (the extraction CLI's write) -> load_index returns the same
    arrays and metadata."""
    e = extracted
    p = tmp_path / "emb.npz"
    np.savez(
        p, **e["cat"],
        paths=np.asarray(e["meta"]["paths"]),
        raw_captions=np.asarray(e["meta"]["raw_captions"]),
    )
    cat, meta = serve.load_index(p)
    assert set(cat) == set(serve.EMBED_KEYS)
    for k in serve.EMBED_KEYS:
        np.testing.assert_array_equal(cat[k], e["cat"][k])
    assert meta["paths"] == e["meta"]["paths"]
    assert meta["raw_captions"] == e["meta"]["raw_captions"]


def test_query_index_cli(tmp_path, monkeypatch):
    """extract -> query on the shipped smoke config: the query CLI builds
    no dataset, derives the template from the index npz, and its results
    for the split's own captions agree with the extraction CLI's top-k."""
    cfg = json.loads(
        Path("configs/smoke/synthetic_retrieval.json").read_text()
    )
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    def run(script, argv):
        spec = importlib.util.spec_from_file_location(
            Path(script).stem, script
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr("sys.argv", [script] + argv)
        mod.main()

    emb = tmp_path / "emb.npz"
    run("scripts/extract_embeddings.py",
        ["-c", str(cfg_path), "--split", "test", "--output", str(emb)])

    data = np.load(emb, allow_pickle=False)
    n = data["g_t"].shape[0]
    captions = [str(c) for c in data["raw_captions"]][:4]
    assert all(captions)  # datasets expose the raw caption in meta
    qfile = tmp_path / "queries.txt"
    qfile.write_text("\n".join(captions))
    qres = tmp_path / "query_results.json"
    run("scripts/query_index.py",
        ["-c", str(cfg_path), "--index", str(emb),
         "--queries-file", str(qfile), "-k", str(n), "--output", str(qres)])

    # expected: the npz's own text rows scored against its gallery with the
    # non-square transpose convention and the config's loss knobs (the
    # smoke config sets focal_type; read it back)
    from demovlp_tpu.ops.similarity import sim_matrix
    from demovlp_tpu.parallel.sharded_eval import sharded_local_sims
    from demovlp_tpu.parallel import create_mesh

    loss_args = cfg["loss"].get("args", {})
    want = np.asarray(sim_matrix(data["g_t"], data["g_o"]))
    if loss_args.get("use_local", False):
        want = want + sharded_local_sims(
            data["l_o"], data["l_t"], data["o_mask"], data["t_mask"],
            create_mesh(),
            lambda_softmax=float(loss_args.get("lambda_softmax", 20.0)),
            focal_type=loss_args.get("focal_type", "prob"),
            backend="xla",
        ).T
    paths = [str(p) for p in data["paths"]]
    got = json.loads(qres.read_text())
    assert len(got) == len(captions)
    for qi, r in enumerate(got):
        assert r["query_caption"] == captions[qi]
        got_row = np.empty(n, np.float32)
        got_row[r["topk_indices"]] = r["topk_scores"]
        np.testing.assert_allclose(got_row, want[qi], atol=1e-4)
        assert r["topk_paths"] == [paths[i] for i in r["topk_indices"]]


def test_query_index_cli_gallery_only_index(tmp_path, monkeypatch):
    """ADVICE round-4 items 1+2: a GLOBAL-ONLY index (no o_mask/l_* keys —
    load_index tolerates them missing) with raw_captions but NO paths must
    query without KeyError: the init template's segment count falls back to
    the config's arch num_frames, local scoring self-disables, and
    gallery_meta is not passed when it lacks the consumed 'paths' key.
    Scores must equal the pure global similarity of the npz's own rows."""
    cfg = json.loads(
        Path("configs/smoke/synthetic_retrieval.json").read_text()
    )
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    def run(script, argv):
        spec = importlib.util.spec_from_file_location(
            Path(script).stem, script
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr("sys.argv", [script] + argv)
        mod.main()

    emb = tmp_path / "emb.npz"
    run("scripts/extract_embeddings.py",
        ["-c", str(cfg_path), "--split", "test", "--output", str(emb)])
    full = np.load(emb, allow_pickle=False)
    stripped = tmp_path / "emb_global_only.npz"
    np.savez(
        stripped, g_o=full["g_o"], g_t=full["g_t"],
        raw_captions=full["raw_captions"],
    )

    captions = [str(c) for c in full["raw_captions"]][:3]
    qfile = tmp_path / "queries.txt"
    qfile.write_text("\n".join(captions))
    qres = tmp_path / "query_results.json"
    n = full["g_o"].shape[0]
    run("scripts/query_index.py",
        ["-c", str(cfg_path), "--index", str(stripped),
         "--queries-file", str(qfile), "-k", str(n), "--output", str(qres)])

    from demovlp_tpu.ops.similarity import sim_matrix

    want = np.asarray(sim_matrix(full["g_t"], full["g_o"]))
    got = json.loads(qres.read_text())
    assert len(got) == len(captions)
    for qi, r in enumerate(got):
        assert r["query_caption"] == captions[qi]
        assert "topk_paths" not in r  # no paths in the index -> no meta
        got_row = np.empty(n, np.float32)
        got_row[r["topk_indices"]] = r["topk_scores"]
        np.testing.assert_allclose(got_row, want[qi], atol=1e-4)
