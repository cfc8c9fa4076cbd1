"""Dual console+file logging (ref utils/logger.py:24-208)."""

from __future__ import annotations

import functools
import logging
import warnings
from datetime import datetime
from pathlib import Path

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
}

LOGGER_NAME = "icepy4d_tpu"


def setup_logger(
    log_folder: str | Path | None = None,
    base_filename: str = "icepy4d_tpu",
    console_log_level: str = "info",
    logfile_level: str = "info",
) -> logging.Logger:
    if console_log_level not in _LEVELS or logfile_level not in _LEVELS:
        raise ValueError(
            f"Invalid log level; choose from {sorted(_LEVELS)}"
        )
    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()

    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)-8s | %(message)s", "%H:%M:%S"
    )
    ch = logging.StreamHandler()
    ch.setLevel(_LEVELS[console_log_level])
    ch.setFormatter(fmt)
    logger.addHandler(ch)

    if log_folder is not None:
        folder = Path(log_folder)
        folder.mkdir(parents=True, exist_ok=True)
        stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        fh = logging.FileHandler(folder / f"{base_filename}_{stamp}.log")
        fh.setLevel(_LEVELS[logfile_level])
        fh.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)-8s | %(module)s:%(lineno)d | %(message)s"
            )
        )
        logger.addHandler(fh)
    return logger


def get_logger(name: str = LOGGER_NAME) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        setup_logger()
    return logger


def deprecated(reason: str = ""):
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            warnings.warn(
                f"{func.__name__} is deprecated. {reason}",
                DeprecationWarning,
                stacklevel=2,
            )
            return func(*args, **kwargs)

        return wrapper

    return decorator
