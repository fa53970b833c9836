"""Top-level CLI integration: the shipped smoke config through the real
entry-point assembly (config -> registry -> loaders -> trainer.train())."""
import json
from pathlib import Path

import numpy as np
import pytest

from demovlp_tpu.config import ConfigParser, build_argparser


def _smoke_config(tmp_path) -> Path:
    cfg = json.loads(Path("configs/smoke/synthetic_retrieval.json").read_text())
    cfg["trainer"]["save_dir"] = str(tmp_path / "exps")
    cfg["trainer"]["max_samples_per_epoch"] = 16
    cfg["trainer"]["init_val"] = False
    p = tmp_path / "smoke.json"
    p.write_text(json.dumps(cfg))
    return p


def test_cli_train_smoke(tmp_path):
    from demovlp_tpu.cli import train as cli_train

    parser = build_argparser()
    args = parser.parse_args(["-c", str(_smoke_config(tmp_path))])
    config = ConfigParser(args)
    log = cli_train.run(config, args)
    assert np.isfinite(log["loss_0"])
    assert "val_0_t2v_metrics_R1" in log
    # run dir artifacts: config snapshot + checkpoint
    assert (config.save_dir / "config.json").exists()
    assert (config.save_dir / "checkpoint-epoch1").exists()


def test_config_cli_overrides(tmp_path):
    parser = build_argparser()
    args = parser.parse_args(
        ["-c", str(_smoke_config(tmp_path)), "--lr", "0.5", "--bs", "4"]
    )
    config = ConfigParser(args, test=True)
    assert config["optimizer"]["args"]["lr"] == 0.5
    assert config["data_loader"]["args"]["batch_size"] == 4


def test_config_resume_reload(tmp_path):
    cfg_path = _smoke_config(tmp_path)
    parser = build_argparser()
    args = parser.parse_args(["-c", str(cfg_path)])
    config = ConfigParser(args)
    # resume path: config.json is reloaded from the checkpoint's run dir
    ckpt = config.save_dir / "checkpoint-epochX"
    args2 = parser.parse_args(["-r", str(ckpt)])
    config2 = ConfigParser(args2, test=True)
    assert config2["name"] == config["name"]
    assert config2.resume == ckpt


def test_build_model_precision_and_attn_knobs(tmp_path):
    """precision.norm and object_params.attn_impl reach the constructed arch."""
    import jax.numpy as jnp

    from demovlp_tpu.cli.common import build_model

    cfg = json.loads(Path("configs/smoke/synthetic_retrieval.json").read_text())
    cfg["precision"] = {"compute": "bfloat16", "norm": "bfloat16"}
    cfg["arch"]["args"]["object_params"]["attn_impl"] = "dense"
    p = tmp_path / "knobs.json"
    p.write_text(json.dumps(cfg))
    parser = build_argparser()
    args = parser.parse_args(["-c", str(p)])
    config = ConfigParser(args, test=True)
    model = build_model(config)
    assert model.dtype == jnp.bfloat16
    assert model.norm_dtype == jnp.bfloat16
    assert model.attn_impl == "dense"


@pytest.mark.parametrize(
    "cfg_path",
    sorted(str(p) for p in Path("configs").rglob("*.json")),
)
def test_every_shipped_config_constructs(cfg_path):
    """Each shipped experiment config parses and builds its model, loss,
    metrics, optimizer and text-bucket spec (no data dirs needed)."""
    from demovlp_tpu.cli.common import (
        build_loss,
        build_metrics,
        build_model,
        build_optimizer,
    )
    from demovlp_tpu.train.steps import parse_text_buckets

    parser = build_argparser()
    config = ConfigParser(parser.parse_args(["-c", cfg_path]), test=True)
    model = build_model(config)
    assert model is not None
    assert build_loss(config) is not None
    assert build_metrics(config)
    assert build_optimizer(config) is not None
    buckets = parse_text_buckets(config["trainer"])
    assert buckets is None or buckets == sorted(buckets)


def test_build_optimizer_rejects_pack_small_with_tp(tmp_path):
    from demovlp_tpu.cli.common import build_optimizer

    cfg = json.loads(Path("configs/smoke/synthetic_retrieval.json").read_text())
    cfg["mesh"] = {"model": 2}
    cfg["optimizer"]["args"]["pack_small"] = True
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(cfg))
    parser = build_argparser()
    config = ConfigParser(parser.parse_args(["-c", str(p)]), test=True)
    with pytest.raises(ValueError, match="pack_small"):
        build_optimizer(config)
