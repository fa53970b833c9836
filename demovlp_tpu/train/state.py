"""Training state: params + optimizer state + step counter, mesh-aware."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.struct
import optax

from demovlp_tpu.parallel.mesh import replicated_sharding


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), dtype=jnp.int32),
        )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    sample_batch: dict,
    rng: jax.Array,
    mesh: Optional[Any] = None,
) -> TrainState:
    """Initialize model params on the sample batch and build the state.

    With a mesh: replicated placement when the 'model' axis is 1 (pure data
    parallel), tensor-parallel column/row layouts (parallel/tp.py) when it
    is >1 — so `mesh: {model: N}` in a config is the only switch needed."""
    params = model.init(rng, sample_batch)
    state = TrainState.create(params, tx)
    if mesh is not None:
        from demovlp_tpu.parallel.tp import has_model_axis, shard_state

        if has_model_axis(mesh):
            return shard_state(state, mesh)
        sharding = replicated_sharding(mesh)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
            state,
        )
    return state
