"""Full-model numerical parity against the reference's OWN torch modules.

The reference checkout (read-only test oracle) is imported directly and run
in torch with random weights; the state dict is converted with
convert/torch_import and the flax model must reproduce the outputs exactly
(fp32, atol ~1e-4): embeddings + masks (ObjectRelation, model/model.py:12-96),
the sim matrix (model/model.py:582-590), and QA logits (ObjectQARelation +
BUTDQAHead, model/model.py:200-290, video_qa_mdoel.py:78-97). This is the
strongest feasible step toward the R@1-parity north-star without dataset
assets: if random weights agree to 1e-4 through the full 12-layer stack, a
converted real checkpoint computes the same similarities.

Heavy deps the reference imports but never uses in the model path (timm,
cv2, psutil, msgpack, humanize) are stubbed; its hard-coded timm-ViT file
load is bypassed (we test weight conversion, not timm init).
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")), reason="reference not mounted"
)

# geometry: full-size towers (the flagship shapes), tiny batch
F, K, B, L = 2, 6, 2, 12
NUM_LABEL = 17


def _stub_module(name: str, **attrs):
    import importlib.machinery

    mod = sys.modules.get(name) or types.ModuleType(name)
    if getattr(mod, "__spec__", None) is None:
        # transformers probes importlib.util.find_spec("timm"), which raises
        # on a module whose __spec__ is None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference's model package with unused heavy deps stubbed."""
    import torch.nn as nn

    class DropPath(nn.Module):  # identity in eval (drop_path_rate=0 anyway)
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    def to_2tuple(x):
        return (x, x)

    timm = _stub_module("timm")
    timm_models = _stub_module("timm.models")
    layers = _stub_module(
        "timm.models.layers",
        DropPath=DropPath,
        trunc_normal_=trunc_normal_,
        to_2tuple=to_2tuple,
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
    import model.object_transformer as ref_ot  # noqa: E402

    # bypass the hard-coded timm checkpoint file load (missing in this env)
    ref_model.load_clip_pt_weight = lambda m: m

    # offline DistilBERT: random init at the real config instead of a download
    import transformers

    def _fake_from_pretrained(name_or_path, *a, **kw):
        torch.manual_seed(0)
        return transformers.DistilBertModel(transformers.DistilBertConfig())

    ref_model.AutoModel = types.SimpleNamespace(from_pretrained=_fake_from_pretrained)
    return ref_model, ref_ot


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    input_ids = rng.randint(1, 30000, size=(B, L)).astype(np.int64)
    attn = np.ones((B, L), np.int64)
    attn[0, 7:] = 0  # real padding in one row
    obj = rng.randn(B, F, K, 2054).astype(np.float32)
    omask = np.ones((B, F, K), np.float32)
    omask[0, :, 4:] = 0.0  # partially-valid frames
    omask[1, 1, 2:] = 0.0
    return input_ids, attn, obj, omask


def _to_flax_params(torch_model, num_frames):
    from demovlp_tpu.convert import convert_reference_checkpoint

    sd = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
    return convert_reference_checkpoint(sd, num_frames=num_frames)


def test_object_relation_full_parity(ref):
    ref_model, _ = ref
    torch.manual_seed(7)
    tm = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": F, "time_module": None},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()

    input_ids, attn, obj, omask = _batch()
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

    from demovlp_tpu.models import ObjectRelation

    ours = ObjectRelation(object_num=K, num_frames=F)
    params = _to_flax_params(tm, num_frames=F)
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
        "object_mask",
    ):
        np.testing.assert_allclose(
            np.asarray(out[key]),
            ref_out[key].numpy(),
            atol=1e-4,
            rtol=1e-4,
            err_msg=key,
        )

    # sim matrix semantics (reference model/model.py:582-590)
    from demovlp_tpu.ops.similarity import sim_matrix

    ref_sims = ref_model.sim_matrix(
        ref_out["global_text_embeddings"], ref_out["global_object_embeddings"]
    ).numpy()
    our_sims = np.asarray(
        sim_matrix(out["global_text_embeddings"], out["global_object_embeddings"])
    )
    np.testing.assert_allclose(our_sims, ref_sims, atol=1e-4, rtol=1e-4)


def test_object_qa_relation_full_parity(ref):
    ref_model, _ = ref
    torch.manual_seed(11)
    tm = ref_model.ObjectQARelation(
        object_params={
            "object_num": K,
            "num_frames": F,
            "time_module": None,
            "num_label": NUM_LABEL,
        },
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()

    input_ids, attn, obj, omask = _batch(seed=3)
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

    from demovlp_tpu.models import ObjectQARelation

    ours = ObjectQARelation(object_num=K, num_frames=F, num_label=NUM_LABEL)
    params = _to_flax_params(tm, num_frames=F)
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
    assert logits.shape == (B, NUM_LABEL)
    np.testing.assert_allclose(logits, ref_logits, atol=1e-4, rtol=1e-4)


def test_object_tower_timeattn_parity(ref):
    """The divided space-time variant ('timeattn' time_module,
    object_transformer.py:199-274) through the standalone tower."""
    _, ref_ot = ref
    torch.manual_seed(13)
    tower = ref_ot.ObjectTransformer(
        input_dim=2054, region_nums=K, num_frames=F, output_dim=256,
        time_module="timeattn",
    ).eval()

    _, _, obj, omask = _batch(seed=5)
    with torch.no_grad():
        ref_y, ref_mask = tower(torch.from_numpy(obj), torch.from_numpy(omask))

    from demovlp_tpu.convert.torch_import import _convert_object_tower
    from demovlp_tpu.models.object_transformer import ObjectTransformer

    sd = {k: v.detach().cpu().numpy() for k, v in tower.state_dict().items()}
    params = {
        "params": _convert_object_tower(
            sd, "", depth=12, num_frames=F, has_time_module=True
        )
    }
    ours = ObjectTransformer(
        input_dim=2054, region_nums=K, num_frames=F, output_dim=256,
        time_module="timeattn",
    )
    y, mask = ours.apply(params, obj, omask, True)
    np.testing.assert_allclose(np.asarray(mask), ref_mask.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), ref_y.numpy(), atol=1e-4, rtol=1e-4)


# =====================================================================
# Released-checkpoint contract (VERDICT r2 item 5)
# =====================================================================
def _save_released_ckpt(tmp_path, torch_model, arch: str, num_frames: int):
    """Write a checkpoint with the EXACT schema + key population a released
    reference .pth carries (base/base_trainer.py:176-200): the
    {arch, epoch, state_dict, optimizer, monitor_best, config} wrapper,
    DDP 'module.' key prefixes, and the dead object_model.norm.* /
    blocks.N.norm3.* weights the reference model registers but never runs."""
    opt = torch.optim.AdamW(torch_model.parameters(), lr=1e-5)
    state = {
        "arch": arch,
        "epoch": 7,
        "state_dict": {
            f"module.{k}": v for k, v in torch_model.state_dict().items()
        },
        "optimizer": opt.state_dict(),
        "monitor_best": 11.62,
        "config": {
            "arch": {"type": arch},
            "optimizer": {"type": "AdamW"},
            "n_gpu": 8,
        },
    }
    path = str(tmp_path / f"checkpoint-epoch7-{arch}-{num_frames}f.pth")
    torch.save(state, path)
    return path


def test_released_checkpoint_contract_retrieval(ref, tmp_path):
    """Full-schema round trip: a released-style .pth (wrapper dict + module.
    prefixes + dead keys) converts with strict key accounting, and the
    converted params reproduce the torch model's embeddings."""
    ref_model, _ = ref
    torch.manual_seed(19)
    tm = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": F, "time_module": None},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()
    path = _save_released_ckpt(tmp_path, tm, "ObjectRelation", F)

    from demovlp_tpu.convert import load_reference_checkpoint
    from demovlp_tpu.models import ObjectRelation

    # strict=True: every checkpoint key consumed or provably dead upstream
    params = load_reference_checkpoint(path, num_frames=F, strict=True)

    input_ids, attn, obj, omask = _batch(seed=8)
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
    ours = ObjectRelation(object_num=K, num_frames=F)
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
    for key in ("global_text_embeddings", "global_object_embeddings"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(), atol=1e-4, rtol=1e-4,
            err_msg=key,
        )


def test_released_checkpoint_contract_qa(ref, tmp_path):
    """Strict conversion is total over a QA checkpoint (head.* weight-norm
    keys included)."""
    ref_model, _ = ref
    torch.manual_seed(23)
    tm = ref_model.ObjectQARelation(
        object_params={
            "object_num": K,
            "num_frames": F,
            "time_module": None,
            "num_label": NUM_LABEL,
        },
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()
    path = _save_released_ckpt(tmp_path, tm, "ObjectQARelation", F)

    from demovlp_tpu.convert import load_reference_checkpoint

    params = load_reference_checkpoint(path, num_frames=F, strict=True)
    assert "head" in params["params"]


def test_strict_conversion_rejects_unknown_keys(ref, tmp_path):
    ref_model, _ = ref
    torch.manual_seed(29)
    tm = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": F, "time_module": None},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd["object_model.mystery_head.weight"] = np.zeros((3, 3), np.float32)

    from demovlp_tpu.convert import convert_reference_checkpoint

    with pytest.raises(ValueError, match="mystery_head"):
        convert_reference_checkpoint(sd, num_frames=F, strict=True)


@pytest.mark.parametrize("mode", ["zeros", "interp", "bilinear"])
def test_temporal_inflation_matches_reference_load(ref, tmp_path, mode):
    """Load a 1-frame released checkpoint into a 4-frame model through BOTH
    load pipelines — the reference's own ctor path (load_checkpoint +
    load_temporal_fix, model/model.py:49-62,98-151: DP-prefix fix ->
    _inflate_positional_embeds -> strict load) and our converter — and
    assert identical embeddings at 4 frames, for all three inflation modes."""
    ref_model, _ = ref
    F_TGT = 4
    torch.manual_seed(31)
    src = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": 1, "time_module": None,
                       "model": "object-transformer"},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
    ).eval()
    # make the 1-frame temporal embed non-trivial (fresh init is ~0)
    with torch.no_grad():
        src.object_model.temporal_embed.normal_(0.0, 0.5)
    path = _save_released_ckpt(tmp_path, src, "ObjectRelation", 1)

    tgt = ref_model.ObjectRelation(
        object_params={"object_num": K, "num_frames": F_TGT, "time_module": None,
                       "model": "object-transformer"},
        text_params={"model": "distilbert-base-uncased", "pretrained": True},
        load_checkpoint=path,
        load_temporal_fix=mode,
    ).eval()

    from demovlp_tpu.convert import load_reference_checkpoint
    from demovlp_tpu.models import ObjectRelation

    params = load_reference_checkpoint(
        path, num_frames=F_TGT, temporal_fix=mode, strict=True
    )

    rng = np.random.RandomState(12)
    obj = rng.randn(B, F_TGT, K, 2054).astype(np.float32)
    omask = np.ones((B, F_TGT, K), np.float32)
    omask[0, :, 3:] = 0.0
    input_ids, attn, _, _ = _batch(seed=12)
    with torch.no_grad():
        ref_out = tgt(
            {
                "text": {
                    "input_ids": torch.from_numpy(input_ids),
                    "attention_mask": torch.from_numpy(attn),
                },
                "object": torch.from_numpy(obj),
                "object_mask": torch.from_numpy(omask),
            }
        )
    ours = ObjectRelation(object_num=K, num_frames=F_TGT)
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
    for key in ("global_object_embeddings", "local_object_embeddings"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(), atol=1e-4, rtol=1e-4,
            err_msg=f"{mode}/{key}",
        )
