"""Experiment config system.

Same public surface as the reference's ConfigParser
(parse_config_dist_multi.py): JSON experiment files with
arch/data_loader/loss/metrics/trainer sections, `-c/-r` CLI, dot-path
CLI overrides (--lr -> optimizer.args.lr, --bs -> data_loader.args.batch_size,
train_dist_multi.py:181-189), resume-aware config reload (:28-33),
timestamped save/log/web run dirs with a config.json snapshot (:40-63).
Component construction goes through the explicit registry instead of
reflection; missing ctor args are auto-filled from top-level config keys the
same way the reference's signature inspection did (:88-98).
"""
from __future__ import annotations

import argparse
import inspect
import logging
import os
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

from demovlp_tpu import registry
from demovlp_tpu.utils import read_json, write_json
from demovlp_tpu.utils.logging import setup_logging

# CLI overrides: flag name -> dot path into the config tree
DEFAULT_OVERRIDES = {
    "lr": ("optimizer", "args", "lr"),
    "bs": ("data_loader", "args", "batch_size"),
}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="demovlp_tpu")
    p.add_argument("-c", "--config", default=None, type=str, help="config file path")
    p.add_argument("-r", "--resume", default=None, type=str, help="checkpoint to resume")
    p.add_argument("-d", "--device", default=None, type=str, help="device override")
    p.add_argument("-o", "--observe", action="store_true", help="extra observability")
    p.add_argument("-lr1", "--learning_rate1", type=float, default=2e-4)
    p.add_argument("-sc", "--schedule", type=int, nargs="+", default=[30, 40])
    p.add_argument("-le", "--linear_evaluation", default=False)
    p.add_argument("--lr", "--learning_rate", dest="lr", type=float, default=None)
    p.add_argument("--bs", "--batch_size", dest="bs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def _set_by_path(tree: dict, keys: Sequence[str], value: Any) -> None:
    for k in keys[:-1]:
        tree = tree[k]
    tree[keys[-1]] = value


class ConfigParser:
    def __init__(
        self,
        args: Optional[argparse.Namespace] = None,
        config: Optional[dict] = None,
        timestamp: bool = True,
        test: bool = False,
    ):
        """Either pass a parsed argparse Namespace (CLI path) or a raw config
        dict (programmatic / test path)."""
        self.args = args
        self.resume: Optional[Path] = None

        if config is not None:
            self._config = dict(config)
        else:
            assert args is not None
            if args.resume is None:
                assert args.config is not None, (
                    "Configuration file needs to be specified: add '-c config.json'"
                )
                self._config = read_json(Path(args.config))
            else:
                self.resume = Path(args.resume)
                self._config = read_json(self.resume.parent / "config.json")
                if args.config is not None:
                    self._config.update(read_json(Path(args.config)))
            for flag, target in DEFAULT_OVERRIDES.items():
                value = getattr(args, flag, None)
                if value is not None:
                    _set_by_path(self._config, target, value)

        save_root = Path(self._config.get("trainer", {}).get("save_dir", "exps"))
        # DEMOVLP_RUN_ID pins the run-dir stamp; multi-process launches MUST
        # set it (one shared value, like torchrun's env rendezvous) so every
        # process checkpoints into the SAME timestamped dir — per-process
        # datetime.now() can straddle a second boundary
        if timestamp:
            stamp = os.environ.get("DEMOVLP_RUN_ID", "") or datetime.now().strftime(
                r"%m%d_%H%M%S"
            )
        else:
            stamp = ""
        exper_name = self._config.get("name", "exp")
        self._save_dir = save_root / "models" / exper_name / stamp
        self._web_log_dir = save_root / "web" / exper_name / stamp
        self._log_dir = save_root / "log" / exper_name / stamp

        if not test:
            self._save_dir.mkdir(parents=True, exist_ok=True)
            self._log_dir.mkdir(parents=True, exist_ok=True)
            write_json(self._config, self._save_dir / "config.json")
            setup_logging(self._log_dir)
        self.log_levels = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}

    # ---- component factory ------------------------------------------------
    def initialize(self, name: str, kind: Optional[str] = None, *args,
                   index: Optional[int] = None, **kwargs) -> Any:
        """Instantiate config section `name` ({'type': ..., 'args': {...}})
        through the registry. `kind` defaults to the section name."""
        kind = kind or name
        section = self[name] if index is None else self[name][index]
        type_name = section["type"]
        module_args = dict(section.get("args", {}))
        assert all(k not in module_args for k in kwargs), (
            "Overwriting kwargs given in config file is not allowed"
        )
        module_args.update(kwargs)

        registry._populate()
        ctor = registry.lookup(kind, type_name)
        # auto-fill missing ctor params from top-level config keys, like the
        # reference's signature inspection (parse_config_dist_multi.py:88-98)
        try:
            sig = inspect.signature(ctor)
            for param in sig.parameters:
                if param not in module_args and param in self._config:
                    module_args[param] = self[param]
        except (TypeError, ValueError):
            pass
        return ctor(*args, **module_args)

    def initialize_list(self, name: str, kind: Optional[str] = None, **kwargs):
        """Sections that may be a single dict or a list of dicts (the
        pre-train config's dual data_loader, configs/pt/*.json)."""
        section = self[name]
        if isinstance(section, list):
            return [
                self.initialize(name, kind, index=i, **kwargs)
                for i in range(len(section))
            ]
        return [self.initialize(name, kind, **kwargs)]

    def __getitem__(self, name: str):
        return self._config[name]

    def __contains__(self, name: str) -> bool:
        return name in self._config

    def get(self, name: str, default=None):
        return self._config.get(name, default)

    def get_logger(self, name: str, verbosity: int = 2) -> logging.Logger:
        assert verbosity in self.log_levels
        logger = logging.getLogger(name)
        logger.setLevel(self.log_levels[verbosity])
        return logger

    @property
    def config(self) -> Dict[str, Any]:
        return self._config

    @property
    def save_dir(self) -> Path:
        return self._save_dir

    @property
    def log_dir(self) -> Path:
        return self._log_dir

    @property
    def web_log_dir(self) -> Path:
        return self._web_log_dir
