"""REAL multi-process `jax.distributed` integration tests.

Every other multi-host test in the repo simulates process_count>1 with
injected gathers; these spawn ACTUAL OS processes with a localhost
coordinator (gloo CPU collectives) and run the retrieval CLI end-to-end:
`jax.distributed.initialize` (parallel/mesh.py setup_distributed), the
multi-process global-batch assembly (shard_batch ->
jax.make_array_from_process_local_data), the live `process_allgather`
paths under host_allgather{,_ragged,_pylist}, the mesh-sharded eval with
replicated output, and the coordinated orbax checkpoint save + resume.

This is the layer the reference validated on real 4-node clusters
(train_dist_multi.py:33-38, NCCL rendezvous + the 13 live all_gather sites
in trainer/trainer_dist.py:252-321); here the same contract runs on CPU
with virtual devices, so it is exercised on every test run.

Equality contract: with dropout off, an N-process run differs from the
single-process run only by row permutation inside each global batch (the
train loader strides the SAME epoch permutation across hosts, so global
batch i holds the same sample set at any process count) — the contrastive
losses and AdamW updates are row-permutation invariant up to float
summation order, so the final retrieval metrics must agree.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
CHILD = REPO / "tests" / "mp_child_train.py"

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _mp_config(tmp_path, batch_size: int, epochs: int = 1) -> Path:
    cfg = json.loads(
        (REPO / "configs" / "smoke" / "synthetic_retrieval.json").read_text()
    )
    cfg["name"] = "SyntheticSmokeMP"
    # dropout off: see module docstring (per-row dropout masks are assigned
    # by global row index, which the multi-process interleaving permutes)
    cfg["arch"]["args"]["text_params"]["config"]["dropout"] = 0.0
    cfg["arch"]["args"]["text_params"]["config"]["attention_dropout"] = 0.0
    cfg["data_loader"]["args"]["batch_size"] = batch_size
    cfg["data_loader"]["args"]["num_workers"] = 1
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg["trainer"]["epochs"] = epochs
    cfg["trainer"]["init_val"] = False
    p = tmp_path / f"cfg_bs{batch_size}_ep{epochs}.json"
    p.write_text(json.dumps(cfg))
    return p


def _launch(n_procs, devs_per_proc, cfg_path, tmp_path, run_id, extra=()):
    """Spawn n_procs children; returns their result payloads in process
    order. Asserts every child exits 0."""
    port = _free_port()
    procs, outs, log_paths = [], [], []
    for i in range(n_procs):
        out = tmp_path / f"out_{run_id}_{i}.json"
        log_path = tmp_path / f"log_{run_id}_{i}.txt"
        env = dict(os.environ)
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        if n_procs > 1:
            env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
            env["JAX_NUM_PROCESSES"] = str(n_procs)
            env["JAX_PROCESS_ID"] = str(i)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devs_per_proc}"
        )
        env["DEMOVLP_RUN_ID"] = run_id
        env["TF_CPP_MIN_LOG_LEVEL"] = "2"
        env["PYTHONPATH"] = str(REPO)
        # child output MUST go to a file, not subprocess.PIPE: pipes are
        # drained one child at a time below, so a chatty undrained child
        # blocks on a full 64 KiB pipe mid-run and the whole topology
        # deadlocks into a coordination-service shutdown-barrier timeout
        log_f = open(log_path, "w")
        procs.append(
            (
                subprocess.Popen(
                    [
                        sys.executable, str(CHILD), str(cfg_path), str(out),
                        *extra,
                    ],
                    env=env,
                    cwd=REPO,
                    stdout=log_f,
                    stderr=subprocess.STDOUT,
                ),
                log_f,
            )
        )
        outs.append(out)
        log_paths.append(log_path)
    rcs = []
    try:
        for p, _ in procs:
            try:
                rcs.append(p.wait(timeout=900))
            except subprocess.TimeoutExpired:
                rcs.append(None)
    finally:
        for p, log_f in procs:
            if p.poll() is None:
                p.kill()
            log_f.close()
    for i, rc in enumerate(rcs):
        assert rc == 0, (
            f"proc {i}/{n_procs} rc={rc}:\n"
            + log_paths[i].read_text()[-6000:]
        )
    return [json.loads(o.read_text()) for o in outs]


METRIC_KEYS = [
    f"val_0_{d}_metrics_{m}"
    for d in ("t2v", "v2t")
    for m in ("R1", "R5", "R10", "R50", "MedR")
]


@pytest.fixture(scope="module")
def single_process_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp_single")
    cfg = _mp_config(tmp, batch_size=8)
    (payload,) = _launch(1, 8, cfg, tmp, run_id="sp")
    return payload


def _assert_metrics_match(sp_log, mp_log, n_procs):
    for key in METRIC_KEYS:
        assert key in sp_log and key in mp_log, key
        assert np.isclose(sp_log[key], mp_log[key], rtol=0, atol=1e-6), (
            key, sp_log[key], mp_log[key], n_procs,
        )
    # train loss: same global batches (permuted rows), fp-order tolerance
    assert np.isclose(sp_log["loss_0"], mp_log["loss_0"], atol=1e-4), (
        sp_log["loss_0"], mp_log["loss_0"],
    )
    assert np.isfinite(mp_log["val_loss_0"])


def test_two_process_matches_single(single_process_run, tmp_path):
    cfg = _mp_config(tmp_path, batch_size=4)  # global batch stays 8
    payloads = _launch(2, 4, cfg, tmp_path, run_id="mp2")
    assert [p["process_index"] for p in payloads] == [0, 1]
    for p in payloads:
        assert p["process_count"] == 2
        assert p["device_count"] == 8
        assert p["local_device_count"] == 4
    # metric assembly is collective: every process must report the SAME dict
    for key in METRIC_KEYS + ["val_loss_0"]:
        assert payloads[0]["log"][key] == payloads[1]["log"][key], key
    _assert_metrics_match(single_process_run["log"], payloads[0]["log"], 2)
    # both processes checkpointed into ONE coordinated run dir
    assert payloads[0]["save_dir"] == payloads[1]["save_dir"]
    ckpt = Path(payloads[0]["save_dir"]) / "checkpoint-epoch1"
    assert ckpt.exists() and (ckpt / "meta.json").exists()


def test_four_process_matches_single(single_process_run, tmp_path):
    cfg = _mp_config(tmp_path, batch_size=2)  # global batch stays 8
    payloads = _launch(4, 2, cfg, tmp_path, run_id="mp4")
    for p in payloads:
        assert p["process_count"] == 4
        assert p["device_count"] == 8
    _assert_metrics_match(single_process_run["log"], payloads[0]["log"], 4)


def test_two_process_checkpoint_resume(tmp_path):
    """Epoch 1 under 2 processes -> coordinated orbax save -> fresh 2-process
    job resumes from it (-r) and trains epoch 2."""
    cfg1 = _mp_config(tmp_path, batch_size=4, epochs=1)
    payloads = _launch(2, 4, cfg1, tmp_path, run_id="res1")
    ckpt = Path(payloads[0]["save_dir"]) / "checkpoint-epoch1"
    assert ckpt.exists()

    cfg2 = _mp_config(tmp_path, batch_size=4, epochs=2)
    payloads2 = _launch(
        2, 4, cfg2, tmp_path, run_id="res2", extra=["-r", str(ckpt)]
    )
    for p in payloads2:
        # resumed at epoch 2 (start_epoch = saved epoch + 1), ran only it
        assert p["log"]["epoch"] == 2
    ckpt2 = Path(payloads2[0]["save_dir"]) / "checkpoint-epoch2"
    assert ckpt2.exists()
    meta = json.loads((ckpt2 / "meta.json").read_text())
    assert meta["epoch"] == 2
