"""Flax -> torch export: round-trip through our importer AND a live load into
the reference's own torch modules with forward parity.

The export is the contract that lets a user take a model trained here back
into the reference's eval stack: its state dict must load into the reference
ObjectRelation/ObjectQARelation (model/model.py) with zero missing parameter
keys and reproduce our forward outputs.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from demovlp_tpu.convert import (
    convert_reference_checkpoint,
    export_reference_state_dict,
    load_reference_checkpoint,
    save_reference_checkpoint,
)

REF = "/root/reference"

F, K, B, L = 2, 6, 2, 12
NUM_LABEL = 17


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
def ref():
    """Reference model package with unused heavy deps stubbed (same recipe as
    test_reference_model_parity.py)."""
    if not os.path.isdir(os.path.join(REF, "model")):
        pytest.skip("reference not mounted")
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
    for name in ("cv2", "psutil", "msgpack", "humanize", "msgpack_numpy"):
        try:
            __import__(name)
        except ImportError:
            _stub_module(name)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model.model as ref_model  # noqa: E402

    ref_model.load_clip_pt_weight = lambda m: m
    import transformers

    def _fake_from_pretrained(name_or_path, *a, **kw):
        torch.manual_seed(0)
        return transformers.DistilBertModel(transformers.DistilBertConfig())

    ref_model.AutoModel = types.SimpleNamespace(from_pretrained=_fake_from_pretrained)
    return ref_model


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    input_ids = rng.randint(1, 30000, size=(B, L)).astype(np.int64)
    attn = np.ones((B, L), np.int64)
    attn[0, 7:] = 0
    obj = rng.randn(B, F, K, 2054).astype(np.float32)
    omask = np.ones((B, F, K), np.float32)
    omask[0, :, 4:] = 0.0
    return input_ids, attn, obj, omask


def _our_params(model_cls, seed=0, tiny=False, **kw):
    """tiny=True shrinks both towers (structure identical, fast CPU init) —
    used by the pure round-trip tests; the reference-load test keeps the
    full-size towers the reference model instantiates."""
    if tiny:
        from demovlp_tpu.models.distilbert import DistilBertConfig

        kw.setdefault(
            "text_config",
            DistilBertConfig(
                vocab_size=128, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
                max_position_embeddings=64,
            ),
        )
        kw.setdefault("object_embed_dim", 32)
        kw.setdefault("object_depth", 2)
        kw.setdefault("object_heads", 4)
        kw.setdefault("projection_dim", 16)
    input_ids, attn, obj, omask = _batch()
    if tiny:
        input_ids = input_ids % 128
    model = model_cls(object_num=K, num_frames=F, **kw)
    params = model.init(
        jax.random.PRNGKey(seed),
        {
            "input_ids": input_ids.astype(np.int32),
            "attention_mask": attn.astype(np.int32),
            "object": obj,
            "object_mask": omask,
        },
    )
    return model, params


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                err_msg=f"{path}/{k}",
            )


@pytest.mark.parametrize("time_module", [None, "timeattn"])
def test_export_import_roundtrip_retrieval(time_module):
    from demovlp_tpu.models import ObjectRelation

    _, params = _our_params(ObjectRelation, tiny=True, time_module=time_module)
    sd = export_reference_state_dict(params)
    back = convert_reference_checkpoint(
        sd, num_frames=F, depth=2, n_text_layers=2, strict=True
    )
    _tree_equal(params["params"], back["params"])


def test_export_import_roundtrip_qa():
    from demovlp_tpu.models import ObjectQARelation

    _, params = _our_params(ObjectQARelation, tiny=True, num_label=NUM_LABEL)
    sd = export_reference_state_dict(params)
    back = convert_reference_checkpoint(
        sd, num_frames=F, depth=2, n_text_layers=2, strict=True
    )
    _tree_equal(params["params"], back["params"])


def test_save_reference_checkpoint_schema(tmp_path):
    """The saved .pth carries the reference _save_checkpoint wrapper and our
    own load path accepts it end to end."""
    from demovlp_tpu.models import ObjectRelation

    _, params = _our_params(ObjectRelation, tiny=True)
    path = str(tmp_path / "export.pth")
    save_reference_checkpoint(
        path, params, epoch=3, config={"name": "x"}, monitor_best=1.5
    )
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {
        "arch", "epoch", "state_dict", "optimizer", "monitor_best", "config",
    }
    assert ckpt["epoch"] == 3 and ckpt["arch"] == "ObjectRelation"
    back = load_reference_checkpoint(
        path, num_frames=F, depth=2, n_text_layers=2, strict=True
    )
    _tree_equal(params["params"], back["params"])


def test_export_loads_into_reference_with_forward_parity(ref):
    """The exported state dict loads into the reference's OWN torch
    ObjectRelation with zero missing parameter keys, and the torch forward
    reproduces our embeddings (the full back-conversion contract)."""
    from demovlp_tpu.models import ObjectRelation

    ours, params = _our_params(ObjectRelation, seed=5)
    sd = {k: torch.from_numpy(v) for k, v in export_reference_state_dict(params).items()}

    tm = ref.ObjectRelation(
        object_params={"object_num": K, "num_frames": F, "time_module": None},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # only non-parameter buffers (e.g. HF position_ids) may be missing
    assert all("position_ids" in k for k in missing), missing

    input_ids, attn, obj, omask = _batch(seed=5)
    with torch.no_grad():
        ref_out = tm(
            {
                "text": {
                    "input_ids": torch.from_numpy(input_ids),
                    "attention_mask": torch.from_numpy(attn),
                },
                "object": torch.from_numpy(obj),
                "object_mask": torch.from_numpy(omask),
            }
        )
    out = ours.apply(
        params,
        {
            "input_ids": input_ids.astype(np.int32),
            "attention_mask": attn.astype(np.int32),
            "object": obj,
            "object_mask": omask,
        },
        deterministic=True,
    )
    for key in (
        "global_text_embeddings",
        "local_text_embeddings",
        "global_object_embeddings",
        "local_object_embeddings",
    ):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(),
            atol=1e-4, rtol=1e-4, err_msg=key,
        )


def test_export_qa_loads_into_reference_with_logit_parity(ref):
    """QA variant: the exported weight-norm head (g/v scalars) loads into
    the reference's torch ObjectQARelation and reproduces our QA logits."""
    from demovlp_tpu.models import ObjectQARelation

    ours, params = _our_params(ObjectQARelation, seed=9, num_label=NUM_LABEL)
    sd = {
        k: torch.from_numpy(v)
        for k, v in export_reference_state_dict(params).items()
    }

    tm = ref.ObjectQARelation(
        object_params={
            "object_num": K,
            "num_frames": F,
            "time_module": None,
            "num_label": NUM_LABEL,
        },
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in k for k in missing), missing

    input_ids, attn, obj, omask = _batch(seed=9)
    with torch.no_grad():
        ref_logits = tm(
            {
                "text": {
                    "input_ids": torch.from_numpy(input_ids),
                    "attention_mask": torch.from_numpy(attn),
                },
                "object": torch.from_numpy(obj),
                "object_mask": torch.from_numpy(omask),
            }
        )["logits"].numpy()
    logits = np.asarray(
        ours.apply(
            params,
            {
                "input_ids": input_ids.astype(np.int32),
                "attention_mask": attn.astype(np.int32),
                "object": obj,
                "object_mask": omask,
            },
            deterministic=True,
        )["logits"]
    )
    np.testing.assert_allclose(logits, ref_logits, atol=1e-4, rtol=1e-4)
