"""Tensor parallelism over the mesh's 'model' axis.

The reference has no tensor parallelism at all (its NCCL layer is pure data
parallel, train_dist_multi.py:33-38); the ('data','model') mesh was designed
with TP headroom from round 1 and this module makes it real: Megatron-style
column/row sharding of every transformer MLP and attention projection in
both towers. GSPMD does the rest — a column-parallel matmul yields
'model'-sharded activations, the following row-parallel matmul contracts the
sharded axis, and XLA inserts the psum over ICI. No module code changes;
sharding is pure annotation on the param (and Adam mu/nu) pytrees.

Rules (matched on the trailing (module, leaf) path names, so they apply
uniformly to `state.params` and to the optimizer's mu/nu mirrors):

  column-parallel (output features split):  qkv, q_lin, k_lin, v_lin,
                                            fc1, ffn_lin1
  row-parallel   (input features split):    attn/proj, out_lin, fc2,
                                            ffn_lin2

Everything else (embeddings, LayerNorms, heads, scalars) is replicated.
A dimension that does not divide the 'model' axis size falls back to
replicated — annotation never changes numerics, only layout.

On the fused 'qkv' kernel: column-sharding its 3*D output axis ignores the
q/k/v (and head) boundaries, which in principle could force GSPMD to
reshard at the per-head reshape. Verified by HLO inspection of the
compiled (4,2)-mesh train step (round 3): ZERO all-gathers are attributed
to qkv/attention modules — GSPMD propagates the slice-of-sharded-axis
through split + head reshape without collectives (the step's gathers all
belong to the loss's global-batch assembly, which is inherent). The naive
layout is therefore kept.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from demovlp_tpu.parallel.mesh import MODEL_AXIS

_COLUMN = {"qkv", "q_lin", "k_lin", "v_lin", "fc1", "ffn_lin1"}
_ROW = {"fc2", "ffn_lin2", "out_lin"}


def _key_name(entry) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def tp_spec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one pytree leaf given its key path."""
    if model_size <= 1 or not hasattr(leaf, "ndim"):
        return P()
    names = [_key_name(k) for k in path]
    if len(names) < 2:
        return P()
    mod, kind = names[-2], names[-1]
    parent = names[-3] if len(names) >= 3 else ""
    # 'proj' is row-parallel only under an attention module (space 'attn' or
    # temporal 'timeattn') — the towers' FINAL projections are also named
    # 'proj' and must stay replicated
    row = mod in _ROW or (mod == "proj" and parent in ("attn", "timeattn"))
    if mod in _COLUMN:
        if kind == "kernel" and leaf.ndim == 2 and leaf.shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
        if kind == "bias" and leaf.ndim == 1 and leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS)
    elif row and kind == "kernel":
        if leaf.ndim == 2 and leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
    return P()


def state_shardings(tree: Any, mesh: Mesh) -> Any:
    """A NamedSharding pytree matching `tree` (params, TrainState, anything
    whose leaves mirror param names) under the TP rules above."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape))[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf, model_size)),
        tree,
    )


def shard_state(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its TP sharding."""
    return jax.tree_util.tree_map(
        jax.device_put, tree, state_shardings(tree, mesh)
    )


def has_model_axis(mesh: Mesh) -> bool:
    """True iff the mesh carries a real (>1) 'model' axis."""
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1) > 1


def state_shardings_or_none(tree: Any, mesh: Mesh):
    """TP sharding pytree when the mesh has a real 'model' axis, else None
    (= the replicated data-parallel default). The single switch used by the
    trainers, create_train_state and the driver dryrun."""
    return state_shardings(tree, mesh) if has_model_axis(mesh) else None
