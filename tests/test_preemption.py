"""Preemption recovery: SIGKILL a live training run, relaunch the SAME
command, assert auto-resume continues to the identical final state.

The reference's recovery story is a manual `-r <path>` relaunch
(base/base_trainer.py:202-267). Here `trainer.resume: "auto"` +
commit-marker-gated checkpoint discovery (train/checkpoint.py) make
recovery a plain re-run of the same command — the fault-tolerance story a
preemptible TPU job needs. Determinism makes the assertion exact: the
loader permutation is seeded by (seed, epoch), the dropout key is folded
with the restored state.step, so a run killed after epoch 1 and resumed
must reproduce the uninterrupted run's epoch-2 state bit-for-bit (metrics
compared exactly).
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
CHILD = REPO / "tests" / "mp_child_train.py"

pytestmark = pytest.mark.slow


def _config(tmp_path, tag: str, epochs: int = 2) -> Path:
    cfg = json.loads(
        (REPO / "configs" / "smoke" / "synthetic_retrieval.json").read_text()
    )
    cfg["name"] = f"SyntheticPreempt_{tag}"
    cfg["trainer"]["save_dir"] = str(tmp_path / f"exps_{tag}")
    cfg["trainer"]["epochs"] = epochs
    cfg["trainer"]["init_val"] = False
    cfg["trainer"]["resume"] = "auto"
    p = tmp_path / f"cfg_{tag}.json"
    p.write_text(json.dumps(cfg))
    return p


def _launch(cfg_path: Path, out: Path, log_path: Path, run_id: str):
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["DEMOVLP_RUN_ID"] = run_id
    env["TF_CPP_MIN_LOG_LEVEL"] = "2"
    env["PYTHONPATH"] = str(REPO)
    log_f = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, str(CHILD), str(cfg_path), str(out)],
        env=env, cwd=REPO, stdout=log_f, stderr=subprocess.STDOUT,
    )
    return proc, log_f


def _wait_payload(proc, log_f, out: Path, timeout=600) -> dict:
    try:
        rc = proc.wait(timeout=timeout)
    finally:
        if proc.poll() is None:
            proc.kill()
        log_f.close()
    assert rc == 0, Path(log_f.name).read_text()[-4000:]
    return json.loads(out.read_text())


METRIC_KEYS = [
    f"val_0_{d}_metrics_{m}"
    for d in ("t2v", "v2t")
    for m in ("R1", "R5", "R10", "R50", "MedR", "MeanR")
]


def test_sigkill_and_autoresume_matches_uninterrupted(tmp_path):
    # ---- reference run: 2 epochs, never interrupted --------------------
    cfg_a = _config(tmp_path, "ref")
    proc, log_f = _launch(cfg_a, tmp_path / "out_ref.json",
                          tmp_path / "log_ref.txt", run_id="ref")
    ref = _wait_payload(proc, log_f, tmp_path / "out_ref.json")
    assert ref["log"]["epoch"] == 2

    # ---- victim run: SIGKILL once epoch 1 is committed ------------------
    cfg_b = _config(tmp_path, "vic")
    proc, log_f = _launch(cfg_b, tmp_path / "out_vic.json",
                          tmp_path / "log_vic.txt", run_id="vic1")
    marker = (tmp_path / "exps_vic" / "models" / "SyntheticPreempt_vic"
              / "vic1" / "checkpoint-epoch1" / "meta.json")
    deadline = time.time() + 600
    while not marker.exists():
        assert proc.poll() is None, (
            "victim exited before it could be killed:\n"
            + (tmp_path / "log_vic.txt").read_text()[-4000:]
        )
        assert time.time() < deadline, "epoch-1 commit marker never appeared"
        time.sleep(0.2)
    # marker present = epoch 1 fully committed (async waiter done); the
    # process is somewhere inside epoch 2 — kill it dead, no cleanup
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    log_f.close()
    assert not (tmp_path / "out_vic.json").exists()

    # ---- relaunch the SAME command: auto-resume from epoch 1 -----------
    proc, log_f = _launch(cfg_b, tmp_path / "out_vic.json",
                          tmp_path / "log_vic2.txt", run_id="vic2")
    resumed = _wait_payload(proc, log_f, tmp_path / "out_vic.json")

    # it trained ONLY epoch 2 (resume log proves the restore ran)
    assert resumed["log"]["epoch"] == 2
    log_txt = (tmp_path / "log_vic2.txt").read_text()
    assert "Resumed from" in log_txt and "checkpoint-epoch1" in log_txt

    # identical final state: eval metrics match the uninterrupted run
    # exactly, train loss to fp tolerance (same batches, same rng streams)
    for key in METRIC_KEYS:
        assert resumed["log"][key] == ref["log"][key], key
    assert np.isclose(resumed["log"]["loss_0"], ref["log"]["loss_0"],
                      rtol=0, atol=1e-5)
    assert np.isclose(resumed["log"]["val_loss_0"], ref["log"]["val_loss_0"],
                      rtol=0, atol=1e-5)

    # and the relaunched run committed epoch 2 in its own run dir
    ckpt2 = (tmp_path / "exps_vic" / "models" / "SyntheticPreempt_vic"
             / "vic2" / "checkpoint-epoch2")
    assert (ckpt2 / "meta.json").exists()
