"""Multi-step END-TO-END training parity against the reference's own torch
stack (round-4 VERDICT item 8): N steps of the reference trainer
(`trainer/trainer_dist.py:104-203` `Multi_ObjectTrainer_dist._train_epoch`)
vs our RetrievalTrainer, both starting from the SAME converted init and
consuming IDENTICAL synthetic batches, asserting per-step train-loss
agreement. One contract pins the whole chain at once:

    model fwd (model/model.py:70-96) -> sim_matrix -> GlobalLocalLoss
    (model/loss.py:29-45) -> backward -> transformers-4.10 AdamW update
    (train_dist_multi.py:64; our `reference_exact` optimizer) -> the -sc
    epoch step-decay LR reset (trainer_dist.py:97-102, exercised by a
    milestone between the two epochs).

Dropout is disabled on BOTH sides (masks are framework-RNG-specific); the
reference's region tower already defaults to zero drop rates
(object_transformer.py:313-315), so only the DistilBERT config changes.
"""
from __future__ import annotations

import logging
import types

import numpy as np
import pytest
import torch

import jax

from tests.test_optimizer_parity import _TorchReferenceAdamW
from tests.test_reference_model_parity import ref  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow

F, K, B, L = 2, 6, 8, 12  # B divisible by the 8-device test mesh
N_BATCHES = 2   # per epoch
EPOCHS = 2      # milestone between them exercises the -sc decay plumbing
LR = 1e-4
LR1 = 2e-4
SCHEDULE = [1]  # epoch 2 runs at LR1 * 0.1
# Adam eps raised from the 1e-6 default ON BOTH SIDES: at eps=1e-6 the
# early update is ~sign(g)-like, so ~1e-6 cross-framework per-op grad noise
# flips update SIGNS on near-zero-grad entries and amplifies chaotically
# (measured: step-0 loss agreement 1.3e-6 rel, step-3 1.2e-2). A smoother
# eps keeps the update Lipschitz in g so framework noise stays linear,
# while every semantic contract (bias-correction form, decay placement,
# LR schedule) still shifts losses far beyond tolerance if broken. The
# exact eps=1e-6 math itself is pinned by tests/test_optimizer_parity.py.
EPS = 1e-4


def _batches(seed=11):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(EPOCHS * N_BATCHES):
        ids = rng.randint(1, 30000, size=(B, L)).astype(np.int64)
        attn = np.ones((B, L), np.int64)
        for i in range(B):
            attn[i, rng.randint(4, L + 1):] = 0
            ids[i] *= attn[i]
        obj = rng.randn(B, F, K, 2054).astype(np.float32)
        omask = np.ones((B, F, K), np.float32)
        for i in range(B):
            omask[i, rng.randint(0, F), rng.randint(2, K + 1):] = 0.0
        out.append(
            dict(input_ids=ids, attention_mask=attn, object=obj,
                 object_mask=omask)
        )
    return out


class _ScalarCollector:
    """writer stand-in (both trainers): keeps every loss_train_0 scalar."""

    def __init__(self):
        self.losses = []

    def set_step(self, *a, **kw):
        pass

    def log_scalar(self, name, value, *a, **kw):
        if name == "loss_train_0":
            self.losses.append(float(value))


class _RefEpochLoader:
    """reference-trainer-shaped loader over one epoch's batches
    (pre-tokenized text dicts; tokenizer=None path)."""

    def __init__(self, batches):
        self.batches = batches
        self.batch_size = B
        self.train_sampler = types.SimpleNamespace(set_epoch=lambda e: None)

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            yield {
                "text": {
                    "input_ids": torch.from_numpy(b["input_ids"]),
                    "attention_mask": torch.from_numpy(b["attention_mask"]),
                },
                "object": torch.from_numpy(b["object"]),
                "object_mask": torch.from_numpy(b["object_mask"]),
            }


class _KeyTokenizer:
    """Our prepare_batch tokenizes data['text'] strings; hand it keys into
    the shared pre-generated token arrays."""

    def __init__(self, batches):
        self.table = {}
        for bi, b in enumerate(batches):
            for i in range(B):
                self.table[f"s{bi}_{i}"] = (
                    b["input_ids"][i].astype(np.int32),
                    b["attention_mask"][i].astype(np.int32),
                )

    def __call__(self, texts, max_length=100, **kw):
        ids = np.stack([self.table[t][0] for t in texts])
        attn = np.stack([self.table[t][1] for t in texts])
        return {"input_ids": ids, "attention_mask": attn}


class _OurEpochLoader:
    def __init__(self, batches, epoch_slices):
        self.batches = batches
        self.epoch_slices = epoch_slices  # epoch -> list of batch indices
        self.batch_size = B
        self.dataset = types.SimpleNamespace(segments=F, object_num=K)
        self._epoch = 1

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __len__(self):
        return len(self.epoch_slices[self._epoch])

    def __iter__(self):
        for bi in self.epoch_slices[self._epoch]:
            b = self.batches[bi]
            yield {
                "text": [f"s{bi}_{i}" for i in range(B)],
                "object": b["object"],
                "object_mask": b["object_mask"],
                "meta": [{} for _ in range(B)],
            }


def _run_reference(ref, batches, monkeypatch):
    ref_model, _ = ref
    import sys

    import transformers

    def _nodrop(name_or_path, *a, **kw):
        torch.manual_seed(0)
        return transformers.DistilBertModel(
            transformers.DistilBertConfig(dropout=0.0, attention_dropout=0.0)
        )

    monkeypatch.setattr(
        ref_model, "AutoModel",
        types.SimpleNamespace(from_pretrained=_nodrop),
    )
    torch.manual_seed(3)
    tm = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": F, "time_module": None},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    )

    import model.loss as ref_loss_mod
    import trainer.trainer_dist as T

    rt = object.__new__(T.Multi_ObjectTrainer_dist)
    rt.model = tm
    rt.loss = ref_loss_mod.GlobalLocalLoss(focal_type="equal")
    rt.optimizer = _TorchReferenceAdamW(tm.parameters(), lr=LR, eps=EPS)
    rt.metrics = []
    rt.tokenizer = None
    rt.device = "cpu"
    rt.n_gpu = 1
    writer = _ScalarCollector()
    rt.writer = writer
    # rank 0 feeds the writer; local_rank 1 skips the print/log branches
    rt.args = types.SimpleNamespace(
        local_rank=1, rank=0, learning_rate1=LR1, schedule=SCHEDULE,
        world_size=1,
    )
    rt.logger = logging.getLogger("ref_e2e")
    rt.max_samples_per_epoch = 10 ** 9
    rt.total_batch_sum = B
    rt.batch_size = B
    rt.log_step = max(1, int(np.sqrt(B)))
    rt.do_validation = False
    rt.len_epoch = N_BATCHES

    epoch_losses = []
    for epoch in range(1, EPOCHS + 1):
        rt.data_loader = [
            _RefEpochLoader(
                batches[(epoch - 1) * N_BATCHES: epoch * N_BATCHES]
            )
        ]
        log = rt._train_epoch(epoch)
        epoch_losses.append(log["loss_0"])
    return tm, writer.losses, epoch_losses


def _run_ours(tm, batches, tmp_path):
    from demovlp_tpu.config import ConfigParser
    from demovlp_tpu.convert import convert_reference_checkpoint
    from demovlp_tpu.losses import GlobalLocalLoss
    from demovlp_tpu.models import ObjectRelation
    from demovlp_tpu.models.distilbert import DistilBertConfig
    from demovlp_tpu.parallel import create_mesh
    from demovlp_tpu.parallel.mesh import replicated_sharding
    from demovlp_tpu.train import RetrievalTrainer, make_optimizer
    from demovlp_tpu.train.state import TrainState

    config = ConfigParser(
        config={
            "name": "train_parity_e2e",
            "n_gpu": 8,
            "arch": {"type": "ObjectRelation", "args": {}},
            "optimizer": {"type": "AdamW", "args": {"lr": LR}},
            "loss": {"type": "GlobalLocalLoss", "args": {}},
            "metrics": [],
            "trainer": {
                "epochs": EPOCHS,
                "save_dir": str(tmp_path),
                "monitor": "off",
                "init_val": False,
            },
        },
        test=False,
        timestamp=False,
    )
    mesh = create_mesh()
    model = ObjectRelation(
        object_num=K, num_frames=F,
        text_config=DistilBertConfig(dropout=0.0, attention_dropout=0.0),
    )
    loss = GlobalLocalLoss(use_local=True, use_global=True, coef=1.0,
                           focal_type="equal")
    tx = make_optimizer(lr=LR, eps=EPS, reference_exact=True)
    epoch_slices = {
        e: list(range((e - 1) * N_BATCHES, e * N_BATCHES))
        for e in range(1, EPOCHS + 1)
    }
    writer = _ScalarCollector()
    trainer = RetrievalTrainer(
        model, loss, [], tx, config, mesh,
        data_loader=[_OurEpochLoader(batches, epoch_slices)],
        valid_data_loader=[],
        tokenizer=_KeyTokenizer(batches),
        writer=writer,
        max_samples_per_epoch=10 ** 9,
        schedule=SCHEDULE,
        learning_rate1=LR1,
        lr_mode="reference",
    )
    # identical init: convert the torch model's state dict
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    params = convert_reference_checkpoint(sd, num_frames=F)
    rep = replicated_sharding(mesh)
    params = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, params
    )
    trainer.state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
        TrainState.create(params, tx),
    )

    epoch_losses = []
    for epoch in range(1, EPOCHS + 1):
        log = trainer._train_epoch(epoch)
        epoch_losses.append(log["loss_0"])
    return writer.losses, epoch_losses


def test_train_epoch_parity(ref, tmp_path, monkeypatch):  # noqa: F811
    batches = _batches()
    tm, ref_steps, ref_epochs = _run_reference(ref, batches, monkeypatch)
    # _run_reference trained tm IN PLACE; our side must convert the INITIAL
    # weights, so rebuild the torch model at the same seeds below
    assert len(ref_steps) == EPOCHS * N_BATCHES

    # rebuild the torch model at the SAME seed for the untouched init
    torch.manual_seed(3)
    import transformers

    ref_model = __import__("model.model", fromlist=["model"])

    def _nodrop(name_or_path, *a, **kw):
        torch.manual_seed(0)
        return transformers.DistilBertModel(
            transformers.DistilBertConfig(dropout=0.0, attention_dropout=0.0)
        )

    monkeypatch.setattr(
        ref_model, "AutoModel", types.SimpleNamespace(from_pretrained=_nodrop)
    )
    tm_init = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": F, "time_module": None},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    )

    our_steps, our_epochs = _run_ours(tm_init, batches, tmp_path)
    assert len(our_steps) == EPOCHS * N_BATCHES

    # step 0 is pre-optimizer-divergence: identical converted init +
    # identical batch -> model fwd + loss assembly parity, tight
    assert np.isclose(our_steps[0], ref_steps[0], rtol=1e-4, atol=1e-4), (
        our_steps[0], ref_steps[0],
    )
    for i, (r, o) in enumerate(zip(ref_steps, our_steps)):
        assert np.isclose(o, r, rtol=2e-3, atol=2e-3), (
            f"step {i}: ours {o} vs reference {r} "
            f"(all ref {ref_steps}, ours {our_steps})"
        )
    np.testing.assert_allclose(our_epochs, ref_epochs, rtol=2e-3, atol=2e-3)
    # the milestone actually moved the LR: losses across the boundary exist
    # and remained finite/parity-matched (asserted above); additionally the
    # step-1 loss must differ from step-3 (training moved the params)
    assert abs(ref_steps[0] - ref_steps[-1]) > 1e-4
