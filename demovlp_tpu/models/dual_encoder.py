"""Flagship model families: dual-encoder retrieval (ObjectRelation), videoQA
(ObjectQARelation), multiple-choice (ObjectMCRelation).

Behavior spec: reference model/model.py.
  * text tower: DistilBERT last_hidden_state -> ReLU -> Dense(768->256)
    ("minimal" projection, model.py:39-43); CLS row is the global text
    embedding, remaining rows the local word embeddings (:86-90)
  * object tower: ObjectTransformer; CLS row global, rest local (:92-96)
  * retrieval forward returns the five-tensor embedding dict with the
    object mask trimmed of its CLS row (:70-84)
  * QA: all-position max-pool over projected text (INCLUDING pad positions,
    :286 — preserved), BUTD head over non-CLS region embeddings with the
    BINARY region mask flattened to (B, F*K) (:280-289)
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from demovlp_tpu.models.distilbert import DistilBertConfig, DistilBertModel
from demovlp_tpu.models.object_transformer import ObjectTransformer
from demovlp_tpu.models.qa_head import BUTDQAHead


class _TextTower(nn.Module):
    projection_dim: int = 256
    text_config: DistilBertConfig = DistilBertConfig()
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        hidden = DistilBertModel(
            self.text_config, self.dtype, self.norm_dtype, name="text_model"
        )(input_ids, attention_mask, deterministic)
        # "minimal" projection: ReLU then Dense (reference model.py:40-43)
        proj = nn.Dense(self.projection_dim, dtype=self.dtype, name="txt_proj")(
            nn.relu(hidden)
        )
        if return_hidden:
            return proj, hidden
        return proj


class MLMHead(nn.Module):
    """DistilBERT-style masked-LM head (vocab transform -> GELU -> LN ->
    vocab projector). The reference ships the 80/10/10 masking helper but no
    head (utils/util.py:193-240, dead); BASELINE.json names contrastive+MLM
    as the pre-training objective, so the head is first-class here."""

    vocab_size: int
    dim: int
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        import jax

        x = nn.Dense(self.dim, dtype=self.dtype, name="vocab_transform")(hidden)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=jnp.float32,
            param_dtype=jnp.float32, name="vocab_layer_norm",
        )(x.astype(jnp.float32)).astype(x.dtype)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="vocab_projector")(x)


class ObjectRelation(nn.Module):
    """Dual-encoder retrieval model (reference model/model.py:12-197)."""

    object_num: int = 30
    num_frames: int = 4
    time_module: Optional[str] = None
    projection_dim: int = 256
    text_config: DistilBertConfig = DistilBertConfig()
    object_embed_dim: int = 768
    object_depth: int = 12
    object_heads: int = 12
    attn_impl: str = "dense"
    with_mlm: bool = False
    dtype: Any = jnp.float32
    # LayerNorm compute dtype for both towers (f32 = reference numerics;
    # bfloat16 drops per-norm converts — models/layers.LayerNormFp32)
    norm_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        self.text_tower = _TextTower(
            self.projection_dim, self.text_config, self.dtype,
            self.norm_dtype, name="text_tower"
        )
        self.object_model = ObjectTransformer(
            input_dim=2054,
            region_nums=self.object_num,
            num_frames=self.num_frames,
            output_dim=self.projection_dim,
            time_module=self.time_module or None,
            embed_dim=self.object_embed_dim,
            depth=self.object_depth,
            num_heads=self.object_heads,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            norm_dtype=self.norm_dtype,
            remat=self.remat,
            name="object_model",
        )
        if self.with_mlm:
            self.mlm_head = MLMHead(
                vocab_size=self.text_config.vocab_size,
                dim=self.text_config.dim,
                layer_norm_eps=self.text_config.layer_norm_eps,
                dtype=self.dtype,
                name="mlm_head",
            )

    def compute_text(self, input_ids, attention_mask, deterministic: bool = True):
        t = self.text_tower(input_ids, attention_mask, deterministic)
        return t[:, 0], t[:, 1:]

    def compute_object(self, object_feat, object_mask, deterministic: bool = True):
        o, add_mask = self.object_model(object_feat, object_mask, deterministic)
        return o[:, 0], o[:, 1:], add_mask

    def __call__(self, batch, deterministic: bool = True):
        """batch: {input_ids (B,L), attention_mask (B,L), object (B,F,K,2054),
        object_mask (B,F,K)} -> embedding dict (reference model.py:70-84);
        + mlm_logits when with_mlm."""
        if self.with_mlm:
            t, hidden = self.text_tower(
                batch["input_ids"], batch["attention_mask"], deterministic,
                return_hidden=True,
            )
            g_t, l_t = t[:, 0], t[:, 1:]
        else:
            g_t, l_t = self.compute_text(
                batch["input_ids"], batch["attention_mask"], deterministic
            )
        g_o, l_o, add_mask = self.compute_object(
            batch["object"], batch["object_mask"], deterministic
        )
        out = dict(
            global_text_embeddings=g_t,
            local_text_embeddings=l_t,
            global_object_embeddings=g_o,
            local_object_embeddings=l_o,
            object_mask=add_mask[:, 1:],  # additive, CLS trimmed
        )
        if self.with_mlm:
            out["mlm_logits"] = self.mlm_head(hidden)
        return out


class ObjectQARelation(nn.Module):
    """Video-QA model: towers + BUTD fusion head (reference model.py:200-390)."""

    object_num: int = 30
    num_frames: int = 4
    num_label: int = 1500
    time_module: Optional[str] = None
    projection_dim: int = 256
    text_config: DistilBertConfig = DistilBertConfig()
    object_embed_dim: int = 768
    object_depth: int = 12
    object_heads: int = 12
    attn_impl: str = "dense"
    head_dropout: float = 0.2  # BUTD attention dropout (reference :63)
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32  # see ObjectRelation
    remat: bool = False

    def setup(self):
        self.text_tower = _TextTower(
            self.projection_dim, self.text_config, self.dtype,
            self.norm_dtype, name="text_tower"
        )
        self.object_model = ObjectTransformer(
            input_dim=2054,
            region_nums=self.object_num,
            num_frames=self.num_frames,
            output_dim=self.projection_dim,
            time_module=self.time_module or None,
            embed_dim=self.object_embed_dim,
            depth=self.object_depth,
            num_heads=self.object_heads,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            norm_dtype=self.norm_dtype,
            remat=self.remat,
            name="object_model",
        )
        self.head = BUTDQAHead(
            v_dim=self.projection_dim,
            q_dim=self.projection_dim,
            hid_dim=self.projection_dim,
            out_dim=self.num_label,
            dropout=self.head_dropout,
            dtype=self.dtype,
            name="head",
        )

    def __call__(self, batch, deterministic: bool = True):
        text = self.text_tower(
            batch["input_ids"], batch["attention_mask"], deterministic
        )  # (B, L, 256)
        obj, _ = self.object_model(
            batch["object"], batch["object_mask"], deterministic
        )
        # max-pool over ALL text positions, padded included (reference :286)
        text_pooled = jnp.max(text, axis=1)
        B = obj.shape[0]
        flat_mask = batch["object_mask"].reshape(B, -1)  # binary (B, F*K)
        logits = self.head(text_pooled, obj[:, 1:], flat_mask, deterministic)
        return dict(logits=logits)


class ObjectMCRelation(ObjectRelation):
    """Multiple-choice model — identical architecture to ObjectRelation,
    scored by option-expanded similarity (reference model.py:393-579)."""
