"""Cross-cutting utilities: logging, timing, config parsing."""

from icepy4d_tpu.utils.config import parse_cfg
from icepy4d_tpu.utils.logger import get_logger, setup_logger
from icepy4d_tpu.utils.timer import AverageTimer, timeit

__all__ = ["parse_cfg", "get_logger", "setup_logger", "AverageTimer", "timeit"]
