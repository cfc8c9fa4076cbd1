"""Season-stable shape buckets for variable-length geometry inputs.

Every device geometry program (RANSAC GV, essential-pose, triangulation,
BA) takes padded point sets. Exact shapes would recompile per epoch;
power-of-TWO buckets still straddle frequently at real match counts
(e.g. 1995 vs 2279 tie points -> 2048 vs 4096 = two multi-second remote
compiles). A power-of-FOUR ladder (64, 256, 1024, 4096, 16384, ...)
trades at most 4x padded compute — milliseconds for these programs —
for a jit cache that a whole season almost always shares.
"""

from __future__ import annotations


def pad_bucket(n: int, floor: int = 64) -> int:
    """Smallest power-of-4 multiple of `floor` that holds `n`."""
    cap = floor
    while cap < n:
        cap *= 4
    return cap
