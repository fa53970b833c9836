"""Run-directory logging: console + rotating file handler.

Mirrors the behavior of the reference's logger/logger.py:7-22 +
logger_config.json (console INFO + rotating info.log per run dir) without
the external JSON config file.
"""
from __future__ import annotations

import logging
import logging.handlers
from pathlib import Path

_FMT_CONSOLE = "%(message)s"
_FMT_FILE = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def setup_logging(save_dir, filename: str = "info.log", level=logging.INFO) -> None:
    """Configure the root logger with a console handler and a rotating file
    handler inside `save_dir`."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    # Clear pre-existing handlers so repeated setup (tests) doesn't duplicate.
    for h in list(root.handlers):
        root.removeHandler(h)

    console = logging.StreamHandler()
    console.setLevel(level)
    console.setFormatter(logging.Formatter(_FMT_CONSOLE))
    root.addHandler(console)

    fileh = logging.handlers.RotatingFileHandler(
        save_dir / filename, maxBytes=10 * 1024 * 1024, backupCount=20, encoding="utf8"
    )
    fileh.setLevel(logging.INFO)
    fileh.setFormatter(logging.Formatter(_FMT_FILE))
    root.addHandler(fileh)


def get_logger(name: str, verbosity: int = 2) -> logging.Logger:
    log_levels = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}
    assert verbosity in log_levels, f"verbosity {verbosity} invalid; options: {list(log_levels)}"
    logger = logging.getLogger(name)
    logger.setLevel(log_levels[verbosity])
    return logger
