"""Convergence A/B for the -fast config's shipped deviations: text_buckets
(PARITY.md #14) and length_grouped batching (PARITY.md #15).

Mirrors the round-3 bf16-local A/B: fixed seeds, synthetic pre-train with a
REALISTIC long-tail caption-length distribution (so the buckets actually
engage), 15 epochs on the CPU-forced 8-device mesh, three arms:

  base     — reference-exact sampling + fixed pad-to-100
  buckets  — trainer.text_buckets [32,48,64]            (deviation #14)
  fast     — buckets + data_loader length_grouped       (#14 + #15, the
             exact knob set configs/pt/o2t-cl-local-select-loss-cc-fast.json
             ships)
  sort     — buckets + the REJECTED earlier design (exact-length stable
             sort, length_grouped="sort", measurement-only loader mode):
             quantifies the convergence harm that motivated the
             class-granular partition (cited by data/loader.py
             _length_group and PARITY.md #15)

Each arm runs the real CLI end-to-end in a subprocess (tests/
mp_child_train.py dumps the final flattened log); per-epoch train-loss
curves come from the run dir's scalars.jsonl. Prints markdown tables ready
for BENCH_NOTES.md.

AB_SEEDS (comma-separated, default "0") runs every arm once per seed —
the seed drives BOTH the model-init/dropout rng (CLI --seed) and the
loader shuffle/bucket-order seed (data_loader.args.seed) — and appends a
cross-seed mean table, since single-seed R@K deltas at this scale sit
inside run-to-run noise.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CHILD = REPO / "tests" / "mp_child_train.py"
EPOCHS = int(os.environ.get("AB_EPOCHS", 15))
SAMPLES = int(os.environ.get("AB_SAMPLES", 512))
BATCH = 32


def make_cfg(tmp: Path, tag: str, buckets: bool, grouped: bool,
             seed: int = 0) -> Path:
    cfg = json.loads(
        (REPO / "configs" / "smoke" / "synthetic_retrieval.json").read_text()
    )
    cfg["name"] = f"ABTextBuckets_{tag}"
    dl = cfg["data_loader"]
    dl["args"]["batch_size"] = BATCH
    dl["args"]["object_params"]["num_samples"] = SAMPLES
    dl["args"]["object_params"]["caption_style"] = "long_tail"
    dl["args"]["length_grouped"] = grouped
    dl["args"]["seed"] = seed
    tr = cfg["trainer"]
    tr["epochs"] = EPOCHS
    tr["max_samples_per_epoch"] = SAMPLES
    tr["save_dir"] = str(tmp / f"exps_{tag}")
    tr["init_val"] = False
    tr["early_stop"] = 10000
    if buckets:
        tr["text_buckets"] = [32, 48, 64]
    p = tmp / f"cfg_{tag}.json"
    p.write_text(json.dumps(cfg))
    return p


def run_arm(tmp: Path, tag: str, buckets: bool, grouped: bool,
            seed: int = 0):
    cfg = make_cfg(tmp, tag, buckets, grouped, seed=seed)
    out = tmp / f"out_{tag}.json"
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["DEMOVLP_RUN_ID"] = "ab"
    env["PYTHONPATH"] = str(REPO)
    env["TF_CPP_MIN_LOG_LEVEL"] = "2"
    res = subprocess.run(
        [sys.executable, str(CHILD), str(cfg), str(out), "--seed", str(seed)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    if res.returncode != 0:
        raise RuntimeError(
            f"{tag} failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
        )
    final = json.loads(out.read_text())["log"]
    # per-epoch mean train loss from the per-step writer stream
    jsonl = (tmp / f"exps_{tag}" / "log" / f"ABTextBuckets_{tag}" / "ab"
             / "scalars.jsonl")
    steps_per_epoch = SAMPLES // BATCH
    sums: dict[int, list] = {}
    for line in jsonl.read_text().splitlines():
        rec = json.loads(line)
        if rec["tag"] == "train/loss_train_0":
            ep = (rec["step"] - 1) // steps_per_epoch + 1
            sums.setdefault(ep, []).append(rec["value"])
    curve = {ep: sum(v) / len(v) for ep, v in sorted(sums.items())}
    return curve, final


ARMS = (
    ("base", dict(buckets=False, grouped=False)),
    ("buckets", dict(buckets=True, grouped=False)),
    ("fast", dict(buckets=True, grouped=True)),
    ("sort", dict(buckets=True, grouped="sort")),
)
ARM_TAGS = tuple(t for t, _ in ARMS)


def main() -> None:
    seeds = [int(s) for s in os.environ.get("AB_SEEDS", "0").split(",")]
    per_seed = {}
    for seed in seeds:
        tmp = Path(tempfile.mkdtemp(prefix=f"ab_buckets_s{seed}_"))
        arms = {
            tag: run_arm(tmp, tag, seed=seed, **kw) for tag, kw in ARMS
        }
        per_seed[seed] = arms
        print(f"\n## seed {seed}  ({EPOCHS} epochs, {SAMPLES} long-tail "
              f"samples, b={BATCH}; run dirs under {tmp})\n")
        print("| epoch | " + " | ".join(f"{t} loss" for t in ARM_TAGS) + " |")
        print("|---" * (len(ARM_TAGS) + 1) + "|")
        for ep in sorted(arms["base"][0]):
            row = [arms[t][0].get(ep, float("nan")) for t in ARM_TAGS]
            print(f"| {ep} | " + " | ".join(f"{v:.4f}" for v in row) + " |")
        keys = sorted(
            k for k in arms["base"][1]
            if k.startswith("val_0_") or k in ("loss_0", "val_loss_0")
        )
        print()
        print("| metric | " + " | ".join(ARM_TAGS) + " |")
        print("|---" * (len(ARM_TAGS) + 1) + "|")
        for k in keys:
            row = [arms[t][1][k] for t in ARM_TAGS]
            print(f"| {k} | "
                  + " | ".join(f"{float(v):.4f}" for v in row) + " |")
    if len(seeds) > 1:
        keys = sorted(
            k for k in per_seed[seeds[0]]["base"][1]
            if k.startswith("val_0_") or k in ("loss_0", "val_loss_0")
        )
        print(f"\n## mean over seeds {seeds}\n")
        print("| metric | " + " | ".join(ARM_TAGS) + " |")
        print("|---" * (len(ARM_TAGS) + 1) + "|")
        for k in keys:
            row = [
                sum(float(per_seed[s][t][1][k]) for s in seeds) / len(seeds)
                for t in ARM_TAGS
            ]
            print(f"| {k} | " + " | ".join(f"{v:.4f}" for v in row) + " |")


if __name__ == "__main__":
    main()
