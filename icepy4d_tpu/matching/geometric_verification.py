"""Geometric verification of putative matches.

Replaces the reference's pydegensac / cv2 USAC_MAGSAC fundamental-matrix
RANSAC (matching/geometric_verification.py:11-102) with the on-device
hypothesis-parallel RANSAC (ops/ransac.py): all hypotheses are solved and
Sampson-scored in one batched XLA program instead of a sequential C++
loop. PYDEGENSAC / MAGSAC / JAX_RANSAC all route here (same thresholds).
"""

from __future__ import annotations

import logging

import jax
import numpy as np

from icepy4d_tpu.matching.enums import GeometricVerification
from icepy4d_tpu.ops.ransac import ransac_fundamental

logger = logging.getLogger("icepy4d_tpu")

MIN_MATCHES = 8


def geometric_verification(
    mkpts0: np.ndarray,
    mkpts1: np.ndarray,
    method: GeometricVerification = GeometricVerification.PYDEGENSAC,
    threshold: float = 1.0,
    confidence: float = 0.9999,
    max_iters: int = 10000,
    seed: int = 0,
    quiet: bool = False,
):
    """Estimate F and an inlier mask from matched keypoints.

    Args / returns mirror the reference (geometric_verification.py:11-102):
    (mkpts0, mkpts1) -> (F (3,3) float64 | None, inlier mask (N,) bool).
    `max_iters` caps the hypothesis count (hypotheses run in parallel on
    device, so unlike the reference the full budget is always spent).
    """
    mkpts0 = np.asarray(mkpts0, np.float32)
    mkpts1 = np.asarray(mkpts1, np.float32)
    n = mkpts0.shape[0]
    if method is GeometricVerification.NONE:
        return None, np.ones(n, bool)
    if n < MIN_MATCHES:
        if not quiet:
            logger.warning(
                "Not enough matches for geometric verification (%d < %d)",
                n, MIN_MATCHES,
            )
        return None, np.ones(n, bool)

    n_hyp = int(min(max_iters, 2048))
    key = jax.random.PRNGKey(seed)
    # pow2 padding: match counts vary per call; exact shapes would
    # recompile the RANSAC program every epoch
    cap = 1 << (n - 1).bit_length()
    pk0 = np.zeros((cap, 2), np.float32)
    pk1 = np.zeros((cap, 2), np.float32)
    pk0[:n] = mkpts0
    pk1[:n] = mkpts1
    F, inl = ransac_fundamental(
        key,
        pk0,
        pk1,
        np.arange(cap) < n,
        threshold=float(threshold),
        n_hypotheses=n_hyp,
    )
    F = np.asarray(F, np.float64)
    inl = np.asarray(inl, bool)[:n]
    if not quiet:
        logger.info(
            "Geometric verification: %d / %d inliers (%.1f%%)",
            int(inl.sum()), n, 100.0 * inl.sum() / max(n, 1),
        )
    return F, inl
