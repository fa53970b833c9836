"""Child entry for the REAL multi-process integration tests
(tests/test_multiprocess.py). Runs one JAX process of an N-process CPU
training job and dumps the final flattened log as JSON.

Usage:  python tests/mp_child_train.py <config.json> <out.json> \
            [--task retrieval|qa|mc] [-r CKPT]

The caller provides the process topology via the standard env contract
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — see
parallel/mesh.py setup_distributed) plus XLA_FLAGS for the per-process
virtual CPU device count and DEMOVLP_RUN_ID for a shared run dir.
"""
from __future__ import annotations

import json
import sys


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        try:
            return float(v)
        except (TypeError, ValueError):
            return str(v)


def main() -> None:
    import jax

    # must beat the environment's sitecustomize to the backend (env vars
    # alone are not enough — see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    cfg_path, out_path = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    task = "retrieval"
    if "--task" in rest:
        i = rest.index("--task")
        task = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    argv = ["-c", cfg_path] + rest

    from demovlp_tpu.cli import train as train_cli
    from demovlp_tpu.cli import train_mc as mc_cli
    from demovlp_tpu.cli import train_qa as qa_cli
    from demovlp_tpu.config import ConfigParser, build_argparser

    cli = {"retrieval": train_cli, "qa": qa_cli, "mc": mc_cli}[task]
    args = build_argparser().parse_args(argv)
    config = ConfigParser(args)
    log = cli.run(config, args)

    payload = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "save_dir": str(config.save_dir),
        "log": {k: _jsonable(v) for k, v in (log or {}).items()},
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)


if __name__ == "__main__":
    main()
