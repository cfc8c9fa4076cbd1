"""Shared constants (reference: core/constants.py:1-5)."""

DATETIME_FMT = "%Y-%m-%d_%H-%M-%S"
DATE_FMT = "%Y-%m-%d"
TIME_FMT = "%H:%M:%S"

# Default padded capacities (static shapes for jit). Powers of two keep
# XLA tiling happy; masks mark the valid prefix.
DEFAULT_MAX_KEYPOINTS = 8192
DEFAULT_DESCRIPTOR_DIM = 256
