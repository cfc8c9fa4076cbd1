"""Free-function geometry API (ref sfm/geometry.py).

`estimate_pose` replaces cv2.findEssentialMat + cv2.recoverPose (ref
sfm/geometry.py:31-76) with the hypothesis-parallel essential RANSAC in
ops/ransac.py; `project_points`/`undistort_points` mirror the reference
signatures (ref sfm/geometry.py:79-133) over the pure-JAX kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops import geometry as geom
from icepy4d_tpu.ops import ransac as ransac_ops

Array = jax.Array


def estimate_pose(
    kpts0: np.ndarray,
    kpts1: np.ndarray,
    K0: np.ndarray,
    K1: np.ndarray,
    thresh: float = 1.0,
    conf: float = 0.9999,
    n_hypotheses: int = 1024,
    seed: int = 0,
):
    """Relative pose from matched keypoints.

    Returns (R, t, valid_mask) like the reference (sfm/geometry.py:31-76),
    or None when fewer than 5 correspondences are given. `conf` is kept
    for signature parity; the hypothesis count plays its role (all
    hypotheses are evaluated in parallel on device, so we always run the
    full budget rather than early-terminating).
    """
    kpts0 = np.asarray(kpts0, np.float32).reshape(-1, 2)
    kpts1 = np.asarray(kpts1, np.float32).reshape(-1, 2)
    n = len(kpts0)
    if n < 5:
        return None
    # pad to a power-of-two bucket: match counts vary per call, and an
    # exact-shape jit would recompile every epoch
    cap = 1 << (n - 1).bit_length()
    pk0 = np.zeros((cap, 2), np.float32)
    pk1 = np.zeros((cap, 2), np.float32)
    pk0[:n] = kpts0
    pk1[:n] = kpts1
    mask = jnp.asarray(np.arange(cap) < n)
    key = jax.random.PRNGKey(seed)
    R, t, _E, inliers = ransac_ops.ransac_essential_pose(
        key,
        jnp.asarray(pk0),
        jnp.asarray(pk1),
        jnp.asarray(K0, jnp.float32),
        jnp.asarray(K1, jnp.float32),
        mask,
        threshold_px=float(thresh),
        n_hypotheses=n_hypotheses,
    )
    return (np.asarray(R), np.asarray(t).reshape(3, 1),
            np.asarray(inliers)[:n])


def project_points(points_3d, camera, image=None):
    """World points -> pixels through a Camera (ref sfm/geometry.py:79-103)."""
    pts = jnp.asarray(points_3d, jnp.float32).reshape(-1, 3)
    return np.asarray(
        geom.project_points(pts, camera.K, camera.extrinsics, camera.dist)
    )


def undistort_points(points_2d, camera):
    """Remove distortion, keeping K as projection (ref sfm/geometry.py:106-133)."""
    pts = jnp.asarray(points_2d, jnp.float32).reshape(-1, 2)
    return np.asarray(geom.undistort_points(pts, camera.K, camera.dist))
