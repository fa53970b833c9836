"""Device mesh + sharding helpers.

TPU-native replacement for the reference's entire distributed substrate
(NCCL process groups at train_dist_multi.py:33-38, DistributedSampler,
DDP wrap, the 13 eval all_gather sites in trainer/trainer_dist.py):

  * one `jax.sharding.Mesh` with ('data', 'model') axes; data parallelism is
    sharding the batch axis, XLA inserts the gradient reductions over ICI.
  * the 'model' axis defaults to 1 (the reference has no TP and the model is
    ~200M params), but every sharding in the framework is written against the
    mesh so scaling it up later is a config change, not a rewrite.
  * multi-host: `jax.distributed.initialize` once; each host feeds its data
    shard (see data/loader.py) and the same jitted step runs SPMD.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def setup_distributed() -> None:
    """Initialize multi-host JAX if a coordinator is configured (no-op on a
    single host). The env-var contract replaces MASTER_ADDR/PORT/RANK:
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return
    # no jax.process_count() guard here: it would initialize the local
    # backend, and jax.distributed.initialize must run BEFORE any backend
    # use. jax.distributed.is_initialized() probes only the distributed
    # state, keeping repeat calls (second trainer, retries) idempotent.
    if jax.distributed.is_initialized():
        return
    # Explicit coordination-service timeouts, overridable via env. On a box
    # with fewer cores than processes (CPU tests on small machines), a
    # time-sliced worker can miss the default heartbeat/shutdown deadlines
    # (observed: DEADLINE_EXCEEDED at the shutdown barrier, 3/4 tasks, on a
    # 1-core host) — callers oversubscribing cores should raise these.
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
        initialization_timeout=int(
            os.environ.get("DEMOVLP_DIST_INIT_TIMEOUT_S", 300)
        ),
        heartbeat_timeout_seconds=int(
            os.environ.get("DEMOVLP_DIST_HEARTBEAT_TIMEOUT_S", 100)
        ),
        shutdown_timeout_seconds=int(
            os.environ.get("DEMOVLP_DIST_SHUTDOWN_TIMEOUT_S", 300)
        ),
    )


def create_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """('data', 'model') mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device_put each array leaf with its batch axis split over 'data'.

    Multi-process semantics (the reference's per-GPU batch contract,
    base/base_data_loader.py): each host passes ITS loader shard and the
    GLOBAL batch is the process-order concatenation — global batch size =
    process_count x per-host batch size. Single-process device_put keeps
    the old identity (host batch == global batch)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def fetch_local_rows(x) -> np.ndarray:
    """This process's own rows of a 'data'-sharded global array, in global
    row order — the inverse of shard_batch's multi-process assembly: host p
    gets back exactly the rows it fed in. Single-process: plain np.asarray
    (the whole array). Model-axis replicas of the same row block are
    deduplicated by their global row offset."""
    if jax.process_count() == 1:
        return np.asarray(x)
    by_start = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = s.data
    return np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)], axis=0
    )


def sync_processes(name: str) -> None:
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_allgather(x):
    """Concatenate a host-local array across processes along axis 0 (the
    TPU-native version of the reference's 13 eval dist.all_gather sites,
    trainer/trainer_dist.py:252-321). No-op on a single host. Requires
    equal shapes on every process — see host_allgather_ragged otherwise."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(x)
    return np.asarray(stacked).reshape(-1, *x.shape[1:])


def host_allgather_ragged(x, allgather=None):
    """Concatenate host-local arrays of UNEQUAL leading-axis lengths across
    processes, in process order. Eval loaders hand each host
    ceil/floor(n / process_count) samples (data/loader.py), so the per-host
    row counts differ by one around the split remainder; process_allgather
    needs equal shapes, so gather the counts first, pad every shard to the
    max, gather, and strip the pads. `allgather` is injectable for
    simulated multi-process tests."""
    if allgather is None:
        if jax.process_count() == 1:
            return np.asarray(x)
        allgather = host_allgather
    x = np.asarray(x)
    counts = allgather(np.asarray([x.shape[0]], np.int64))
    cap = int(np.max(counts))
    if x.shape[0] < cap:
        pad = np.zeros((cap - x.shape[0], *x.shape[1:]), x.dtype)
        x = np.concatenate([x, pad], axis=0)
    gathered = allgather(x)
    parts = [
        gathered[p * cap : p * cap + int(c)] for p, c in enumerate(counts)
    ]
    return np.concatenate(parts, axis=0)


def host_allgather_pylist(items, allgather=None):
    """Concatenate host-local python lists (JSON-serializable items — eval
    metadata strings like paths/captions) across processes in process
    order, so they line up row-for-row with host_allgather_ragged'ed
    embeddings. JSON -> utf-8 bytes -> the same pad-to-max gather as the
    ragged array path. `allgather` is injectable for simulated
    multi-process tests."""
    if allgather is None:
        if jax.process_count() == 1:
            return list(items)
        allgather = host_allgather
    import json

    payload = np.frombuffer(
        json.dumps(list(items)).encode("utf-8"), np.uint8
    )
    counts = allgather(np.asarray([payload.shape[0]], np.int64))
    cap = int(np.max(counts))
    if payload.shape[0] < cap:
        payload = np.concatenate(
            [payload, np.zeros(cap - payload.shape[0], np.uint8)]
        )
    gathered = allgather(payload)
    out = []
    for p, c in enumerate(counts):
        part = gathered[p * cap : p * cap + int(c)].tobytes().decode("utf-8")
        out.extend(json.loads(part))
    return out
