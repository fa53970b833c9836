"""Torch->Flax converter tests with synthetic state dicts (no torch needed:
the mapping is pure numpy; key names follow the reference module tree)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demovlp_tpu.convert import (
    convert_reference_checkpoint,
    inflate_temporal_embed,
    import_timm_vit,
)
from demovlp_tpu.convert.torch_import import strip_dp_prefix
from demovlp_tpu.models import ObjectRelation, ObjectQARelation
from demovlp_tpu.models.distilbert import DistilBertConfig

# tiny geometry shared by the synthetic state dict and the flax model
D_TXT, L_TXT, H_TXT, FF_TXT, VOCAB, MAXPOS = 32, 2, 4, 64, 128, 64
D_OBJ, DEPTH, H_OBJ = 32, 2, 4
PROJ, K, F = 16, 4, 2
NUM_LABEL = 8

TINY_TEXT = DistilBertConfig(
    vocab_size=VOCAB, dim=D_TXT, n_layers=L_TXT, n_heads=H_TXT,
    hidden_dim=FF_TXT, max_position_embeddings=MAXPOS,
)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _linear(rng, sd, key, out_dim, in_dim, bias=True):
    sd[f"{key}.weight"] = _rand(rng, out_dim, in_dim)
    if bias:
        sd[f"{key}.bias"] = _rand(rng, out_dim)


def _ln(rng, sd, key, dim):
    sd[f"{key}.weight"] = np.abs(_rand(rng, dim)) + 0.5
    sd[f"{key}.bias"] = _rand(rng, dim)


def _wn(rng, sd, key, out_dim, in_dim, bias=True):
    sd[f"{key}.weight_g"] = np.abs(_rand(rng, 1))[0] + 0.5
    sd[f"{key}.weight_v"] = _rand(rng, out_dim, in_dim)
    if bias:
        sd[f"{key}.bias"] = _rand(rng, out_dim)


def _synthetic_state_dict(rng, qa=False):
    sd = {}
    # --- text tower (HF distilbert names under text_model.)
    sd["text_model.embeddings.word_embeddings.weight"] = _rand(rng, VOCAB, D_TXT)
    sd["text_model.embeddings.position_embeddings.weight"] = _rand(rng, MAXPOS, D_TXT)
    _ln(rng, sd, "text_model.embeddings.LayerNorm", D_TXT)
    for i in range(L_TXT):
        lp = f"text_model.transformer.layer.{i}"
        for n in ("q_lin", "k_lin", "v_lin", "out_lin"):
            _linear(rng, sd, f"{lp}.attention.{n}", D_TXT, D_TXT)
        _ln(rng, sd, f"{lp}.sa_layer_norm", D_TXT)
        _linear(rng, sd, f"{lp}.ffn.lin1", FF_TXT, D_TXT)
        _linear(rng, sd, f"{lp}.ffn.lin2", D_TXT, FF_TXT)
        _ln(rng, sd, f"{lp}.output_layer_norm", D_TXT)
    _linear(rng, sd, "txt_proj.1", PROJ, D_TXT)
    # --- object tower
    sd["object_model.cls_token"] = _rand(rng, 1, 1, D_OBJ)
    sd["object_model.custom_pos_embed"] = _rand(rng, 1, K + 1, D_OBJ)
    sd["object_model.temporal_embed"] = _rand(rng, 1, F, D_OBJ)
    _linear(rng, sd, "object_model.object_embedding", D_OBJ, 2048)
    _linear(rng, sd, "object_model.pos_embedding", D_OBJ, 6)
    _linear(rng, sd, "object_model.proj", PROJ, D_OBJ, bias=False)
    _ln(rng, sd, "object_model.norm", D_OBJ)  # unused in forward; ignored
    for i in range(DEPTH):
        bp = f"object_model.blocks.{i}"
        _ln(rng, sd, f"{bp}.norm1", D_OBJ)
        _ln(rng, sd, f"{bp}.norm2", D_OBJ)
        _linear(rng, sd, f"{bp}.attn.qkv", 3 * D_OBJ, D_OBJ)
        _linear(rng, sd, f"{bp}.attn.proj", D_OBJ, D_OBJ)
        _linear(rng, sd, f"{bp}.mlp.fc1", 4 * D_OBJ, D_OBJ)
        _linear(rng, sd, f"{bp}.mlp.fc2", D_OBJ, 4 * D_OBJ)
    if qa:
        _wn(rng, sd, "head.v_att.v_proj.main.0", PROJ, PROJ)
        _wn(rng, sd, "head.v_att.q_proj.main.0", PROJ, PROJ)
        _wn(rng, sd, "head.v_att.linear", 1, PROJ)
        _wn(rng, sd, "head.classifier.q_net.main.0", PROJ, PROJ)
        _wn(rng, sd, "head.classifier.v_net.main.0", PROJ, PROJ)
        _linear(rng, sd, "head.classifier.main.0", 2 * PROJ, PROJ)
        _linear(rng, sd, "head.classifier.main.3", NUM_LABEL, 2 * PROJ)
    return sd


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(np.asarray(v).shape)
    return out


def _batch(b=2):
    rng = np.random.RandomState(0)
    return {
        "input_ids": rng.randint(1, VOCAB, size=(b, 10)).astype(np.int32),
        "attention_mask": np.ones((b, 10), np.int32),
        "object": rng.randn(b, F, K, 2054).astype(np.float32),
        "object_mask": np.ones((b, F, K), np.float32),
    }


def _model(qa=False):
    kw = dict(
        object_num=K, num_frames=F, projection_dim=PROJ, text_config=TINY_TEXT,
        object_embed_dim=D_OBJ, object_depth=DEPTH, object_heads=H_OBJ,
    )
    if qa:
        return ObjectQARelation(num_label=NUM_LABEL, **kw)
    return ObjectRelation(**kw)


@pytest.mark.parametrize("qa", [False, True])
def test_converted_tree_matches_model_init(qa):
    rng = np.random.RandomState(0)
    sd = _synthetic_state_dict(rng, qa=qa)
    params = convert_reference_checkpoint(
        sd, num_frames=F, depth=DEPTH, n_text_layers=L_TXT
    )
    model = _model(qa=qa)
    ref = model.init(jax.random.PRNGKey(0), _batch())
    got_shapes = _tree_shapes(params)
    want_shapes = _tree_shapes(jax.tree_util.tree_map(np.asarray, ref))
    assert got_shapes == want_shapes
    # and the model actually runs with converted params
    out = model.apply(params, _batch())
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_dp_prefix_strip():
    sd = {"module.a.weight": np.zeros(2), "module.b.bias": np.ones(2)}
    out = strip_dp_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}
    # untouched when not uniformly prefixed
    sd2 = {"a.weight": np.zeros(2)}
    assert strip_dp_prefix(sd2) is sd2


def test_inflate_temporal_embed_modes():
    emb = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
    # same size: passthrough
    np.testing.assert_array_equal(inflate_temporal_embed(emb, 4), emb)
    # shrink: truncate
    np.testing.assert_array_equal(
        inflate_temporal_embed(emb, 2), emb[:, :2]
    )
    # grow with zeros
    z = inflate_temporal_embed(emb, 6, "zeros")
    assert z.shape == (1, 6, 2)
    np.testing.assert_array_equal(z[:, :4], emb)
    np.testing.assert_array_equal(z[:, 4:], 0)
    # bilinear endpoints preserved
    b = inflate_temporal_embed(emb, 7, "bilinear")
    np.testing.assert_allclose(b[0, 0], emb[0, 0])
    np.testing.assert_allclose(b[0, -1], emb[0, -1])
    # nearest stays within the source values
    n = inflate_temporal_embed(emb, 7, "interp")
    assert set(n.reshape(-1)) <= set(emb.reshape(-1))


def test_weight_norm_numerics():
    """WeightNormDense(g, v) must equal torch weight_norm(dim=None):
    y = x @ (g * v / ||v||_F) + b."""
    from demovlp_tpu.models.layers import WeightNormDense

    rng = np.random.RandomState(1)
    v_torch = rng.randn(5, 3).astype(np.float32)  # (out, in)
    g = np.float32(1.7)
    b = rng.randn(5).astype(np.float32)
    x = rng.randn(4, 3).astype(np.float32)

    params = {
        "params": {"v": v_torch.T, "g": g, "bias": b}
    }
    mod = WeightNormDense(5)
    got = np.asarray(mod.apply(params, jnp.array(x)))
    kernel = g * v_torch.T / np.linalg.norm(v_torch)
    want = x @ kernel + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_import_timm_vit_overrides_blocks():
    rng = np.random.RandomState(2)
    model = _model()
    params = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), _batch())
    )
    vit_sd = {"cls_token": _rand(rng, 1, 1, D_OBJ)}
    for i in range(DEPTH):
        bp = f"blocks.{i}"
        _ln(rng, vit_sd, f"{bp}.norm1", D_OBJ)
        _ln(rng, vit_sd, f"{bp}.norm2", D_OBJ)
        _linear(rng, vit_sd, f"{bp}.attn.qkv", 3 * D_OBJ, D_OBJ)
        _linear(rng, vit_sd, f"{bp}.attn.proj", D_OBJ, D_OBJ)
        _linear(rng, vit_sd, f"{bp}.mlp.fc1", 4 * D_OBJ, D_OBJ)
        _linear(rng, vit_sd, f"{bp}.mlp.fc2", D_OBJ, 4 * D_OBJ)
    new = import_timm_vit(vit_sd, params, depth=DEPTH)
    tower = new["params"]["object_model"]
    np.testing.assert_array_equal(tower["cls_token"], vit_sd["cls_token"])
    np.testing.assert_array_equal(
        tower["blocks_0"]["attn"]["qkv"]["kernel"],
        vit_sd["blocks.0.attn.qkv.weight"].T,
    )
    # non-ViT params untouched
    np.testing.assert_array_equal(
        tower["object_embedding"]["kernel"],
        params["params"]["object_model"]["object_embedding"]["kernel"],
    )
