"""Shared model layers (fp32-safe LayerNorm, MLP, weight-normed Dense)."""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn
import jax


class LayerNormFp32(nn.Module):
    """LayerNorm with a configurable COMPUTE dtype (params always float32).

    Default float32 compute matches the reference (it keeps LayerNorm in
    fp32 under fp16, object_transformer.py:13-19) — the standard bf16
    recipe. `dtype=bfloat16` drops the up/down conversions around every
    norm (convert_reduce fusions were ~10% of the train step in the device
    profile); stats over <=768 lanes are safe in bf16. The result is cast
    back to the input dtype either way.
    """

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # canonicalize: a string dtype (the config convention elsewhere)
        # must behave identically to the jnp dtype object — comparing the
        # raw attribute would silently drop f32 reductions for "float32"
        f32_stats = jnp.dtype(self.dtype) == jnp.float32
        y = nn.LayerNorm(
            epsilon=self.epsilon, dtype=self.dtype, param_dtype=jnp.float32,
            force_float32_reductions=f32_stats,
        )(x.astype(self.dtype))
        return y.astype(orig_dtype)


class Mlp(nn.Module):
    """Transformer MLP: Dense -> GELU -> Dense (+dropout).

    Matches the timm-style Mlp of the reference region tower
    (object_transformer.py:100-122, act=nn.GELU exact)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization over the WHOLE kernel
    (torch weight_norm(..., dim=None): w = g * v / ||v||_F, g scalar).

    Used by the BUTD QA head (reference video_qa_mdoel.py:28,63)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        # torch initializes g = ||v||_F so the effective kernel equals v at init
        g = self.param("g", lambda rng: jnp.linalg.norm(v).astype(jnp.float32))
        kernel = (g / jnp.maximum(jnp.linalg.norm(v), 1e-12)) * v
        y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class FCNet(nn.Module):
    """Multi-layer (weight-normed Dense -> ReLU) stack
    (reference video_qa_mdoel.py:8-36)."""

    dims: Sequence[int]  # [in, hidden..., out]
    norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, out_dim in enumerate(self.dims[1:]):
            if self.norm:
                x = WeightNormDense(out_dim, dtype=self.dtype, name=f"layer{i}")(x)
            else:
                x = nn.Dense(out_dim, dtype=self.dtype, name=f"layer{i}")(x)
            x = nn.relu(x)
        return x


def trunc_normal_init(std: float = 0.02) -> Callable:
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)
