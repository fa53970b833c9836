from demovlp_tpu.parallel.mesh import (
    create_mesh,
    setup_distributed,
    batch_sharding,
    fetch_local_rows,
    replicated_sharding,
    shard_batch,
    sync_processes,
)
from demovlp_tpu.parallel.sharded_eval import sharded_local_sims
from demovlp_tpu.parallel.tp import shard_state, state_shardings

__all__ = [
    "create_mesh",
    "setup_distributed",
    "batch_sharding",
    "fetch_local_rows",
    "replicated_sharding",
    "shard_batch",
    "sync_processes",
    "sharded_local_sims",
    "shard_state",
    "state_shardings",
]
