"""Loss / metric / eval-assembly parity against the reference's OWN code.

Closes the parity chain above the model layer (VERDICT r2 item 1): the
reference's `GlobalLocalLoss` / `NormSoftmaxLoss` / `RWALoss` /
`xattn_score_fast` / `get_sim_by_segment` (model/loss.py:10-330), its numpy
metrics (model/metric.py), and its three trainers' `_valid_epoch` assembly
(gather -> concat -> sims -> metrics, trainer/trainer_dist.py:205-408,
:580-683, :780-880) are imported and run LIVE in torch (world-1 gloo process
group, so every `dist.all_gather` executes for real) on synthetic
embeddings, and our losses, both xattn backends, the mesh-sharded eval, the
metric functions, and our trainers' eval assembly must reproduce the same
scalars / matrices / metric dicts.

Both trainer A/Bs drive the REAL trainer classes (`object.__new__` +
attribute injection — the ctors need live datasets/optimizers that don't
exist in tests) over a shared deterministic embedding function, so a
mismatch in any assembly step (orientation-quirk sum, MSCOCO dedup, loss
accumulation, per-rank gather semantics) fails the test.
"""
from __future__ import annotations

import os
import sys
import tempfile
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")), reason="reference not mounted"
)


def _stub_module(name: str, **attrs):
    import importlib.machinery

    mod = sys.modules.get(name) or types.ModuleType(name)
    if getattr(mod, "__spec__", None) is None:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_loss():
    """Import the reference's model.loss + model.metric (torch/numpy only)."""
    for name in ("cv2", "psutil", "msgpack", "humanize", "msgpack_numpy", "ipdb"):
        try:
            __import__(name)
        except ImportError:
            _stub_module(name, set_trace=lambda: None)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.loss as ref_loss_mod
    import model.metric as ref_metric_mod

    return ref_loss_mod, ref_metric_mod


@pytest.fixture(scope="module")
def ref_trainer(ref_loss):
    """Import the reference trainer package with heavy deps stubbed and a
    LIVE world-1 gloo process group (all `dist.all_gather`/`barrier` calls in
    `_valid_epoch` execute for real)."""
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm = _stub_module("timm")
    timm_models = _stub_module("timm.models")
    layers = _stub_module(
        "timm.models.layers",
        DropPath=DropPath,
        trunc_normal_=trunc_normal_,
        to_2tuple=lambda x: (x, x),
    )
    timm_models.layers = layers
    timm.models = timm_models

    import trainer.trainer_dist as ref_trainer_mod

    import torch.distributed as dist

    if not dist.is_initialized():
        rdv = tempfile.mktemp(prefix="demovlp_gloo_")
        dist.init_process_group(
            backend="gloo", init_method=f"file://{rdv}", world_size=1, rank=0
        )
    return ref_trainer_mod


# ---------------------------------------------------------------- helpers
def _additive(lengths, width):
    """0/-100 additive mask rows from valid lengths (reference convention:
    (mask - 1) * 100 on a 0/1 mask, trainer_dist.py:327)."""
    m = np.zeros((len(lengths), width), np.float32)
    for i, n in enumerate(lengths):
        m[i, n:] = -100.0
    return m


def _synth_local(rng, n, length, dim):
    return rng.randn(n, length, dim).astype(np.float32)


# =====================================================================
# 1. losses vs the reference's torch loss module
# =====================================================================
def test_norm_softmax_loss_parity(ref_loss):
    ref_loss_mod, _ = ref_loss
    from demovlp_tpu.losses import NormSoftmaxLoss

    rng = np.random.RandomState(0)
    sim = np.tanh(rng.randn(16, 16).astype(np.float32))
    for temp in (0.05, 0.07):
        want = ref_loss_mod.NormSoftmaxLoss(temp)(torch.from_numpy(sim)).item()
        got = float(NormSoftmaxLoss(temp)(sim))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("focal_type", ["equal", "prob"])
@pytest.mark.parametrize(
    "use_global,use_local", [(True, True), (True, False), (False, True)]
)
def test_global_local_loss_parity(ref_loss, focal_type, use_global, use_local):
    """Full loss triple (total, global, local) vs reference
    model/loss.py:29-45 on the exact training call surface."""
    ref_loss_mod, _ = ref_loss
    from demovlp_tpu.losses import GlobalLocalLoss

    B, R, W, D = 10, 8, 7, 32
    rng = np.random.RandomState(focal_type == "equal")
    g_sim = np.tanh(rng.randn(B, B)).astype(np.float32)
    local_im = _synth_local(rng, B, R, D)
    local_s = _synth_local(rng, B, W, D)
    im_mask = _additive(rng.randint(2, R + 1, size=B), R)
    s_len = rng.randint(2, W + 1, size=B)
    s_mask = _additive(s_len, W)

    ref = ref_loss_mod.GlobalLocalLoss(
        focal_type=focal_type, use_global=use_global, use_local=use_local
    )
    with torch.no_grad():
        r_total, r_g, r_l = ref(
            torch.from_numpy(g_sim),
            torch.from_numpy(local_im),
            torch.from_numpy(local_s),
            torch.from_numpy(im_mask),
            torch.from_numpy(s_len.astype(np.int64)),
            torch.from_numpy(s_mask),
        )

    ours = GlobalLocalLoss(
        focal_type=focal_type, use_global=use_global, use_local=use_local
    )
    o_total, o_g, o_l = ours(g_sim, local_im, local_s, im_mask, s_len, s_mask)
    np.testing.assert_allclose(float(o_total), float(r_total), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(o_g), float(r_g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(o_l), float(r_l), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("focal_type", ["equal", "prob"])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_xattn_score_parity(ref_loss, focal_type, backend):
    """Non-square xattn score matrix vs reference model/loss.py:294-330,
    both our backends (Pallas in interpreter mode on CPU)."""
    ref_loss_mod, _ = ref_loss

    Ni, Nc, R, W, D = 6, 9, 8, 7, 32
    rng = np.random.RandomState(5)
    images = _synth_local(rng, Ni, R, D)
    captions = _synth_local(rng, Nc, W, D)
    img_mask = _additive(rng.randint(2, R + 1, size=Ni), R)
    cap_mask = _additive(rng.randint(2, W + 1, size=Nc), W)

    with torch.no_grad():
        want = ref_loss_mod.xattn_score_fast(
            torch.from_numpy(images),
            torch.from_numpy(captions),
            torch.from_numpy(img_mask),
            cap_lens=None,
            cap_mask=torch.from_numpy(cap_mask),
            focal_type=focal_type,
        ).numpy()

    if backend == "xla":
        from demovlp_tpu.ops.xattn import xattn_score

        got = np.asarray(
            xattn_score(images, captions, img_mask, cap_mask, 20.0, focal_type)
        )
    else:
        from demovlp_tpu.ops.pallas_xattn import xattn_score_pallas_interpret

        got = np.asarray(
            xattn_score_pallas_interpret(
                images, captions, img_mask, cap_mask, 20.0, focal_type
            )
        )
    assert got.shape == (Ni, Nc)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("focal_type", ["equal", "prob"])
def test_get_sim_by_segment_parity(ref_loss, focal_type):
    """Mesh-sharded eval vs the reference's serial 8x8 blockwise eval loop
    (model/loss.py:73-103) on ragged (non-multiple-of-8, non-multiple-of-
    mesh) gallery/caption counts."""
    ref_loss_mod, _ = ref_loss
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.parallel.sharded_eval import sharded_local_sims

    Ni, Nc, R, W, D = 21, 27, 8, 7, 32
    rng = np.random.RandomState(9)
    img = _synth_local(rng, Ni, R, D)
    cap = _synth_local(rng, Nc, W, D)
    img_mask = _additive(rng.randint(2, R + 1, size=Ni), R)
    cap_len = rng.randint(2, W + 1, size=Nc)
    cap_mask = _additive(cap_len, W)

    ref = ref_loss_mod.RWALoss(focal_type=focal_type)
    with torch.no_grad():
        want = ref.get_sim_by_segment(
            torch.from_numpy(img),
            torch.from_numpy(cap),
            torch.from_numpy(img_mask),
            torch.from_numpy(cap_len.astype(np.int64)),
            torch.from_numpy(cap_mask),
            segment=8,
            device="cpu",
        )

    mesh = create_mesh()
    got = sharded_local_sims(
        img, cap, img_mask, cap_mask, mesh, segment=8, focal_type=focal_type,
        backend="xla",
    )
    assert got.shape == (Ni, Nc)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


# =====================================================================
# 2. metrics vs the reference's numpy metric module
# =====================================================================
def _tied_sims(rng, n_q, n_v):
    """Quantized similarities -> guaranteed rank ties (the hard path in
    reference model/metric.py:58-91)."""
    return np.round(rng.randn(n_q, n_v) * 2) / 4.0


def test_retrieval_metrics_parity(ref_loss):
    _, ref_metric = ref_loss
    import demovlp_tpu.metrics.retrieval as ours

    rng = np.random.RandomState(3)
    for n_q, n_v in ((20, 20), (40, 20)):  # square + 2 captions/video
        sims = _tied_sims(rng, n_q, n_v)
        for name in ("t2v_metrics", "v2t_metrics"):
            want = getattr(ref_metric, name)(sims.copy())
            got = getattr(ours, name)(sims.copy())
            for k, v in want.items():
                np.testing.assert_allclose(
                    got[k], v, rtol=1e-6, err_msg=f"{name}/{k} ({n_q}x{n_v})"
                )


def test_retrieval_metrics_query_mask_parity(ref_loss):
    """query_masks path (missing captions, reference model/metric.py:106-113).
    The reference uses the removed np.bool alias; restore it for the call."""
    _, ref_metric = ref_loss
    import demovlp_tpu.metrics.retrieval as ours

    rng = np.random.RandomState(4)
    n_v, per = 12, 2
    sims = _tied_sims(rng, n_v * per, n_v)
    masks = np.ones((n_v, per))
    masks[0, 1] = 0
    masks[5, 1] = 0
    had = hasattr(np, "bool")
    if not had:
        np.bool = bool  # the reference predates numpy 1.24's alias removal
    try:
        want_t = ref_metric.t2v_metrics(sims.copy(), masks.copy())
        want_v = ref_metric.v2t_metrics(sims.copy(), masks.copy())
    finally:
        if not had:
            del np.bool
    got_t = ours.t2v_metrics(sims.copy(), masks.copy())
    got_v = ours.v2t_metrics(sims.copy(), masks.copy())
    for k in want_t:
        np.testing.assert_allclose(got_t[k], want_t[k], rtol=1e-6, err_msg=f"t2v/{k}")
    for k in want_v:
        np.testing.assert_allclose(got_v[k], want_v[k], rtol=1e-6, err_msg=f"v2t/{k}")


def _qa_fixture(rng, n=40, n_label=10):
    types_ = ["what", "who", "how", "where", "when", "object", "number", "color",
              "location"]
    label2ans = [f"ans{i}" for i in range(n_label)]
    qid2data = {}
    results = []
    for qid in range(n):
        gt = int(rng.randint(n_label))
        qid2data[qid] = {
            "answer": label2ans[gt],
            "answer_type": types_[int(rng.randint(len(types_)))],
        }
        results.append(
            {"question_id": qid, "answer": int(rng.randint(n_label)),
             "data": qid2data[qid]}
        )
    return results, label2ans, qid2data


def test_qa_metric_parity(ref_loss):
    _, ref_metric = ref_loss
    from demovlp_tpu.metrics.qa import evaluate_qa

    rng = np.random.RandomState(6)
    results, label2ans, qid2data = _qa_fixture(rng)
    want = ref_metric.evaluate_qa(results, label2ans, qid2data)
    got = evaluate_qa(results, label2ans, qid2data)
    assert set(got) == set(want)
    for k, v in want.items():
        if k == "ratios":
            for rk, rv in v.items():
                np.testing.assert_allclose(got["ratios"][rk], rv, rtol=1e-9)
        else:
            np.testing.assert_allclose(got[k], v, rtol=1e-9, err_msg=k)


def test_mc_metric_parity(ref_loss):
    _, ref_metric = ref_loss
    from demovlp_tpu.metrics.qa import evaluate_mc

    rng = np.random.RandomState(7)
    gt = {f"vid{i}": int(rng.randint(5)) for i in range(30)}
    pred = {k: int(rng.randint(5)) for k in gt}
    want = ref_metric.evaluate_mc(pred, gt)
    got = evaluate_mc(pred, gt)
    assert got == want


# =====================================================================
# 3. trainer-level eval-assembly A/B (the end numbers)
# =====================================================================
D_EMB = 32
W_TOK = 12  # tokenized length incl. CLS
N_REG = 6


class _EmbedFn:
    """One deterministic embedding function shared by the torch fake model
    and our fake eval step: fixed seeded projections of the raw batch
    arrays, computed in float32 numpy on both sides (bit-identical)."""

    def __init__(self, seed=17):
        rng = np.random.RandomState(seed)
        self.p_gt = rng.randn(W_TOK, D_EMB).astype(np.float32) * 0.1
        self.p_lt = rng.randn(D_EMB).astype(np.float32) * 0.1
        self.p_go = rng.randn(N_REG, D_EMB).astype(np.float32) * 0.1
        self.p_lo = rng.randn(D_EMB).astype(np.float32) * 0.1

    def __call__(self, input_ids, attention_mask, obj, object_mask):
        ids = input_ids.astype(np.float32)
        g_t = np.tanh(ids @ self.p_gt)
        # keep every local vector nonzero: an exactly-zero query embedding
        # makes the reference's unguarded focal re-attention divide 0/0
        # (model/loss.py:263-265); real model embeddings are never all-zero
        pos = 0.3 * np.cos(np.arange(ids.shape[1] - 1, dtype=np.float32))
        l_t = np.tanh(
            ids[:, 1:, None] * self.p_lt[None, None, :] * 0.01
            + pos[None, :, None]
            + self.p_lt[None, None, :]
        )
        feat = obj[:, :, :, 0]  # (B, F, K) summary of the region features
        b = feat.shape[0]
        flat = feat.reshape(b, -1)[:, :N_REG]
        g_o = np.tanh(flat @ self.p_go)
        l_o = np.tanh(flat[:, :, None] * self.p_lo[None, None, :])
        add_mask = (object_mask.reshape(b, -1)[:, :N_REG] - 1.0) * 100.0
        return {
            "global_text_embeddings": g_t,
            "local_text_embeddings": l_t.astype(np.float32),
            "global_object_embeddings": g_o,
            "local_object_embeddings": l_o.astype(np.float32),
            "object_mask": add_mask.astype(np.float32),
        }


class _RefFakeModel:
    """Plain callable (NOT nn.Module: `self.module = self` would recurse in
    nn.Module.train) standing in for the DDP-wrapped model."""

    def __init__(self, embed):
        self.embed = embed
        self.module = self  # stands in for the DDP wrapper

    def eval(self):
        return self

    def __call__(self, data, return_embeds=True):
        out = self.embed(
            data["text"]["input_ids"].numpy(),
            data["text"]["attention_mask"].numpy(),
            data["object"].numpy(),
            data["object_mask"].numpy(),
        )
        return {k: torch.from_numpy(v) for k, v in out.items()}


class _FakeLoader:
    """Yields reference-trainer-shaped batches (pre-tokenized text dicts)."""

    def __init__(self, batches, dataset_name="SYNTH", batch_size=None):
        self.batches = batches
        self.dataset_name = dataset_name
        self.batch_size = batch_size or batches[0]["object"].shape[0]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            # the reference trainer mutates data[...] in place; hand out copies
            yield {
                "meta": list(b["meta"]),
                "text": {k: torch.from_numpy(v) for k, v in b["text"].items()},
                "object": torch.from_numpy(b["object"]),
                "object_mask": torch.from_numpy(b["object_mask"]),
                **{
                    k: torch.from_numpy(b[k])
                    for k in ("label", "question_id")
                    if k in b
                },
                **({"mc_id": list(b["mc_id"])} if "mc_id" in b else {}),
            }


class _OurLoader:
    """Yields our-trainer-shaped batches (text as strings for the fake
    tokenizer)."""

    def __init__(self, batches, tok, dataset_name="SYNTH"):
        self.batches = batches
        self.tok = tok
        self.dataset_name = dataset_name
        self.batch_size = batches[0]["object"].shape[0]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            out = {
                "meta": list(b["meta"]),
                "text": [self.tok.key_of(b, i) for i in range(len(b["meta"]))],
                "object": b["object"],
                "object_mask": b["object_mask"],
            }
            for k in ("label", "question_id", "mc_id"):
                if k in b:
                    out[k] = b[k]
            yield out


class _FakeTokenizer:
    """Maps the synthetic text keys back to the pre-generated token arrays
    (stands in for the HF tokenizer on both our trainer paths)."""

    def __init__(self):
        self.table = {}

    def key_of(self, batch, i):
        return batch["_text_keys"][i]

    def add(self, key, input_ids, attention_mask):
        self.table[key] = (input_ids, attention_mask)

    def __call__(self, texts, max_length=100, **kw):
        ids = np.stack([self.table[t][0] for t in texts])
        attn = np.stack([self.table[t][1] for t in texts])
        return {"input_ids": ids, "attention_mask": attn}


def _make_batches(rng, n, bs, tok, coco=False, with_label=None):
    """Pre-generate n samples in batches of bs. coco=True repeats each video
    across 5 consecutive samples (MSCOCO 5-captions-per-video layout)."""
    batches = []
    for start in range(0, n, bs):
        b = bs
        ids = rng.randint(1, 1000, size=(b, W_TOK)).astype(np.int64)
        attn = np.ones((b, W_TOK), np.int64)
        for i in range(b):
            attn[i, rng.randint(3, W_TOK + 1):] = 0
            ids[i] *= attn[i]
        obj = rng.randn(b, 1, N_REG, 8).astype(np.float32)
        omask = np.ones((b, 1, N_REG), np.float32)
        for i in range(b):
            omask[i, 0, rng.randint(2, N_REG + 1):] = 0.0
        if coco:
            for i in range(b):
                group = ((start + i) // 5) * 5 - start
                src = min(max(group, 0), b - 1)
                obj[i] = obj[src]
                omask[i] = omask[src]
        keys = [f"t{start + i}" for i in range(b)]
        for i, k in enumerate(keys):
            tok.add(k, ids[i].astype(np.int32), attn[i].astype(np.int32))
        batch = {
            "meta": [{"paths": f"v{start + i}", "raw_captions": k}
                     for i, k in enumerate(keys)],
            "_text_keys": keys,
            "text": {"input_ids": ids, "attention_mask": attn},
            "object": obj,
            "object_mask": omask,
        }
        if with_label is not None:
            batch["label"] = rng.randint(0, with_label, size=b).astype(np.int64)
            batch["question_id"] = np.arange(start, start + b).astype(np.int64)
        batches.append(batch)
    return batches


def _capture_metric(store):
    def sims_capture(sims, query_masks=None, fold=None):
        store.append(np.array(sims))
        return {"R1": 0.0, "R5": 0.0, "R10": 0.0, "R50": 0.0,
                "MedR": 0.0, "MeanR": 0.0}

    sims_capture.__name__ = "sims_capture"
    return sims_capture


@pytest.mark.parametrize("config_name", ["SYNTH_retrieval", "MSCOCO_synth"])
def test_retrieval_valid_epoch_assembly_parity(ref_loss, ref_trainer, config_name):
    """End-to-end eval assembly A/B: the reference's real
    `Multi_ObjectTrainer_dist._valid_epoch` (trainer_dist.py:205-408) vs our
    `RetrievalTrainer._valid_epoch` on identical synthetic batches — same
    val_loss, byte-equal assembled sim matrix (incl. the global(t,o) +
    local(o,t) orientation-quirk sum and the MSCOCO ::5 gallery dedup), same
    metric dicts.

    The MSCOCO case runs use_local=False: with use_local=True the REFERENCE
    ITSELF crashes (the ::5 dedup makes the matrix rectangular, so the
    (t,o)+(o,t) quirk sum is a shape error at trainer_dist.py:385, and
    `metric(o2t_sims, fold=5)` is a TypeError — t2v_metrics has no `fold`
    param). Global-only is the only MSCOCO configuration the reference can
    execute; we A/B exactly that."""
    ref_loss_mod, ref_metric = ref_loss
    T = ref_trainer

    coco = config_name.startswith("MSCOCO")
    use_local = not coco
    rng = np.random.RandomState(21)
    tok = _FakeTokenizer()
    n, bs = 40, 8  # bs divides the 8-device test mesh; n is a multiple of 5
    batches = _make_batches(rng, n, bs, tok, coco=coco)
    embed = _EmbedFn()

    # ---------------- reference side (live torch trainer) ----------------
    rt = object.__new__(T.Multi_ObjectTrainer_dist)
    rt.model = _RefFakeModel(embed)
    rt.valid_data_loader = [_FakeLoader(batches)]
    rt.tokenizer = None
    rt.device = "cpu"
    rt.n_gpu = 1
    rt.loss = ref_loss_mod.GlobalLocalLoss(focal_type="equal", use_local=use_local)
    ref_store = []
    rt.metrics = ([_capture_metric(ref_store)] if coco
                  else [ref_metric.t2v_metrics, ref_metric.v2t_metrics,
                        _capture_metric(ref_store)])
    rt.writer = None
    rt.args = types.SimpleNamespace(local_rank=0, rank=0)
    rt.log_step = 100
    rt.config = {"name": config_name, "loss": {"args": {"use_local": use_local}}}
    ref_res = rt._valid_epoch(epoch=0)

    # ---------------- our side (real RetrievalTrainer eval) ----------------
    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.metrics.retrieval import t2v_metrics, v2t_metrics
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.train.retrieval import RetrievalTrainer
    from demovlp_tpu.train.steps import _retrieval_losses
    from demovlp_tpu.ops.masking import additive_mask
    import jax.numpy as jnp

    our_loss = GlobalLocalLoss(focal_type="equal", use_local=use_local)

    def fake_eval_step(params, arrays):
        out = embed(
            np.asarray(arrays["input_ids"]),
            np.asarray(arrays["attention_mask"]),
            np.asarray(arrays["object"]),
            np.asarray(arrays["object_mask"]),
        )
        out = {k: jnp.asarray(v) for k, v in out.items()}
        losses = _retrieval_losses(our_loss, out, arrays)
        out["text_mask_add"] = additive_mask(
            np.asarray(arrays["attention_mask"])[:, 1:]
        )
        out["text_length"] = np.sum(np.asarray(arrays["attention_mask"]), axis=1)
        return out, losses

    ot = object.__new__(RetrievalTrainer)
    ot.state = types.SimpleNamespace(params=None)
    ot._eval_step = fake_eval_step
    ot.valid_data_loader = [_OurLoader(batches, tok)]
    ot.tokenizer = tok
    ot.mesh = create_mesh()
    ot.loss = our_loss
    our_store = []
    ot.metrics = ([_capture_metric(our_store)] if coco
                  else [t2v_metrics, v2t_metrics, _capture_metric(our_store)])
    ot.writer = None
    ot.visualizer = None
    ot.eval_segment = 8
    ot.eval_backend = "xla"
    ot.config = {"name": config_name, "loss": {"args": {"use_local": use_local}}}
    our_res = ot._valid_epoch(epoch=0)

    # the assembled (global + local) sim matrix, element for element
    assert len(ref_store) == len(our_store) == 1
    assert ref_store[0].shape == our_store[0].shape
    np.testing.assert_allclose(our_store[0], ref_store[0], rtol=1e-4, atol=1e-4)

    # accumulated per-batch val loss
    np.testing.assert_allclose(
        our_res["val_loss_0"], ref_res["val_loss_0"], rtol=1e-4
    )

    # end metric dicts
    if not coco:
        for mname in ("t2v_metrics", "v2t_metrics"):
            want = ref_res["nested_val_metrics"][0][mname]
            got = our_res["nested_val_metrics"][0][mname]
            for k, v in want.items():
                np.testing.assert_allclose(
                    got[k], v, rtol=1e-6, err_msg=f"{mname}/{k}"
                )


def test_qa_valid_epoch_assembly_parity(ref_loss, ref_trainer):
    """QA eval assembly A/B (reference trainer_dist.py:580-683): gather ->
    argmax -> results -> evaluate_qa, same end metric dict."""
    _, ref_metric = ref_loss
    T = ref_trainer

    rng = np.random.RandomState(31)
    n, bs, n_label = 24, 8, 7  # bs divides the 8-device test mesh
    tok = _FakeTokenizer()
    batches = _make_batches(rng, n, bs, tok, with_label=n_label)
    embed = _EmbedFn(seed=23)
    logit_proj = np.random.RandomState(37).randn(D_EMB, n_label).astype(np.float32)

    def logits_np(input_ids, attention_mask, obj, omask):
        return embed(input_ids, attention_mask, obj, omask)[
            "global_text_embeddings"
        ] @ logit_proj

    label2ans = [f"a{i}" for i in range(n_label)]
    types_ = ["what", "who", "how", "where", "when", "object", "number", "color",
              "location"]
    qid2data = {}
    qid = 0
    for b in batches:
        for i in range(bs):
            qid2data[qid] = {
                "answer": label2ans[int(b["label"][i])],
                "answer_type": types_[int(rng.randint(len(types_)))],
            }
            qid += 1

    class _RefQAModel:
        def eval(self):
            return self

        def __call__(self, data, return_embeds=True):
            lg = logits_np(
                data["text"]["input_ids"].numpy(),
                data["text"]["attention_mask"].numpy(),
                data["object"].numpy(),
                data["object_mask"].numpy(),
            )
            return {"logits": torch.from_numpy(lg)}

    rt = object.__new__(T.Multi_ObjectQATrainer_dist)
    rt.model = _RefQAModel()
    rt.valid_data_loader = [_FakeLoader(batches)]
    rt.tokenizer = None
    rt.device = "cpu"
    rt.n_gpu = 1
    rt.metrics = [ref_metric.evaluate_qa]
    rt.writer = None
    rt.args = types.SimpleNamespace(local_rank=0, rank=0)
    rt.valid_qid2data = {0: qid2data}
    rt.valid_label2ans = {0: label2ans}
    ref_res = rt._valid_epoch(epoch=0)

    from demovlp_tpu.metrics.qa import evaluate_qa
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.train.qa import QATrainer

    def fake_eval_step(params, arrays):
        return logits_np(
            np.asarray(arrays["input_ids"]),
            np.asarray(arrays["attention_mask"]),
            np.asarray(arrays["object"]),
            np.asarray(arrays["object_mask"]),
        )

    ot = object.__new__(QATrainer)
    ot.state = types.SimpleNamespace(params=None)
    ot._eval_step = fake_eval_step
    ot.valid_data_loader = [_OurLoader(batches, tok)]
    ot.tokenizer = tok
    ot.mesh = create_mesh()
    ot.metrics = [evaluate_qa]
    ot.valid_qid2data = {0: qid2data}
    ot.valid_label2ans = {0: label2ans}
    our_res = ot._valid_epoch(epoch=0)

    want = ref_res["nested_val_metrics"][0]["evaluate_qa"]
    got = our_res["nested_val_metrics"][0]["evaluate_qa"]
    assert set(got) == set(want)
    for k, v in want.items():
        if k == "ratios":
            for rk, rv in v.items():
                np.testing.assert_allclose(got["ratios"][rk], rv, rtol=1e-9)
        else:
            np.testing.assert_allclose(got[k], v, rtol=1e-9, err_msg=k)


def test_mc_valid_epoch_assembly_parity(ref_loss, ref_trainer):
    """MC eval assembly A/B (reference trainer_dist.py:780-880): 1 video x 5
    options -> global+local sims -> argmax -> evaluate_mc."""
    ref_loss_mod, ref_metric = ref_loss
    T = ref_trainer

    rng = np.random.RandomState(41)
    n_items, n_opt = 8, 5
    tok = _FakeTokenizer()
    embed = _EmbedFn(seed=29)

    batches = []
    gt_id2answer = {}
    for item in range(n_items):
        b = _make_batches(rng, n_opt, n_opt, tok)[0]
        # MC batch: ONE video expanded to the option count by the trainers
        b["object"] = b["object"][:1]
        b["object_mask"] = b["object_mask"][:1]
        # re-register keys uniquely per item
        keys = [f"mc{item}_{i}" for i in range(n_opt)]
        for old, new in zip(b["_text_keys"], keys):
            tok.table[new] = tok.table[old]
        b["_text_keys"] = keys
        b["meta"] = [{"paths": f"mcv{item}", "raw_captions": k} for k in keys]
        b["mc_id"] = [f"vid{item}"] * 1  # reference uses data['mc_id'][0]
        batches.append(b)
        gt_id2answer[f"vid{item}"] = int(rng.randint(n_opt))

    rt = object.__new__(T.Multi_ObjectMCTrainer_dist)
    rt.model = _RefFakeModel(embed)
    rt.valid_data_loader = [_FakeLoader(batches, batch_size=1)]
    rt.tokenizer = None
    rt.device = "cpu"
    rt.n_gpu = 1
    rt.loss = ref_loss_mod.GlobalLocalLoss(focal_type="equal")
    rt.metrics = [ref_metric.evaluate_mc]
    rt.writer = None
    rt.args = types.SimpleNamespace(local_rank=0, rank=0)
    rt.valid_gt_id2answer = {0: gt_id2answer}
    ref_res = rt._valid_epoch(epoch=0)

    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.metrics.qa import evaluate_mc
    from demovlp_tpu.ops.masking import additive_mask
    from demovlp_tpu.ops.similarity import sim_matrix
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.train.mc import MCTrainer

    our_loss = GlobalLocalLoss(focal_type="equal")

    def fake_eval_step(params, arrays):
        # mirrors make_mc_eval_step's body (train/steps.py:205-227) with the
        # shared embedding function standing in for the model
        out = embed(
            np.asarray(arrays["input_ids"]),
            np.asarray(arrays["attention_mask"]),
            np.asarray(arrays["object"]),
            np.asarray(arrays["object_mask"]),
        )
        gsim = sim_matrix(
            out["global_text_embeddings"], out["global_object_embeddings"]
        )
        tmask = additive_mask(np.asarray(arrays["attention_mask"])[:, 1:])
        lsim = our_loss.local_loss.get_sim(
            out["local_object_embeddings"],
            out["local_text_embeddings"],
            out["object_mask"],
            None,
            tmask,
        )
        return np.asarray(gsim + lsim)[0]

    ot = object.__new__(MCTrainer)
    ot.state = types.SimpleNamespace(params=None)
    ot._eval_step = fake_eval_step
    ot.valid_data_loader = [_OurLoader(batches, tok)]
    ot.tokenizer = tok
    ot.mesh = create_mesh()
    ot.metrics = [evaluate_mc]
    ot.valid_gt_id2answer = {0: gt_id2answer}
    our_res = ot._valid_epoch(epoch=0)

    want = ref_res["nested_val_metrics"][0]["evaluate_mc"]
    got = our_res["nested_val_metrics"][0]["evaluate_mc"]
    assert got == want
