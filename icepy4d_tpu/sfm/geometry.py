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
from icepy4d_tpu.ops import geometry_np as geom_np
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
    scores: np.ndarray | None = None,
    F_hint: np.ndarray | None = None,
):
    """Relative pose from matched keypoints.

    Returns (R, t, valid_mask) like the reference (sfm/geometry.py:31-76),
    or None when fewer than 5 correspondences are given. `conf` is kept
    for signature parity; the hypothesis count plays its role (all
    hypotheses are evaluated in parallel on device, so we always run the
    full budget rather than early-terminating).

    `scores` enables quality-guided sampling/scoring; `F_hint` seeds the
    hypothesis pool with the matcher's verified F (see
    ops/ransac.py::ransac_essential_pose) — both are what make wide-
    baseline SIFT sets (many chance inliers) solvable.
    """
    kpts0 = np.asarray(kpts0, np.float32).reshape(-1, 2)
    kpts1 = np.asarray(kpts1, np.float32).reshape(-1, 2)
    n = len(kpts0)
    if n < 5:
        return None
    # pad to a power-of-FOUR bucket: match counts vary per call, and
    # exact (or pow2) shapes recompile mid-season (ops/buckets.py)
    from icepy4d_tpu.ops.buckets import pad_bucket

    cap = pad_bucket(n)
    pk0 = np.zeros((cap, 2), np.float32)
    pk1 = np.zeros((cap, 2), np.float32)
    pk0[:n] = kpts0
    pk1[:n] = kpts1
    mask = jnp.asarray(np.arange(cap) < n)
    guidance = None
    if scores is not None and len(scores) == n:
        g = np.zeros((cap,), np.float32)
        g[:n] = np.asarray(scores, np.float32)
        guidance = jnp.asarray(g)
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
        guidance=guidance,
        F_hint=(None if F_hint is None
                else jnp.asarray(F_hint, jnp.float32)),
    )
    return (np.asarray(R), np.asarray(t).reshape(3, 1),
            np.asarray(inliers)[:n])


def project_points(points_3d, camera, image=None):
    """World points -> pixels through a Camera (ref sfm/geometry.py:79-103).

    Host numpy (ops/geometry_np.py): the per-epoch callers (trim-ladder
    residuals, reprojection filters, residual CSVs) run at exact,
    ever-changing shapes — on the device path each shape was a fresh
    remote compile plus a tunnel round trip per call."""
    pts = np.asarray(points_3d, np.float32).reshape(-1, 3)
    return geom_np.project_points(pts, camera.K, camera.extrinsics,
                                  camera.dist)


def undistort_points(points_2d, camera):
    """Remove distortion, keeping K as projection (ref sfm/geometry.py:106-133)."""
    pts = np.asarray(points_2d, np.float32).reshape(-1, 2)
    return geom_np.undistort_points(pts, camera.K, camera.dist)


def fundamental_from_cameras(cam0, cam1) -> np.ndarray:
    """F of an ORIENTED camera pair: x1^T F x0 = 0 for undistorted
    pixel observations. Used to guide epipolar-constrained rematching
    when the pair geometry is known a priori (GCP-resected poses)."""
    E0 = np.asarray(cam0.extrinsics, np.float64)
    E1 = np.asarray(cam1.extrinsics, np.float64)
    R = E1[:3, :3] @ E0[:3, :3].T
    t = E1[:3, 3] - R @ E0[:3, 3]
    tx = np.array([[0.0, -t[2], t[1]],
                   [t[2], 0.0, -t[0]],
                   [-t[1], t[0], 0.0]])
    Ess = tx @ R
    K0 = np.asarray(cam0.K, np.float64)
    K1 = np.asarray(cam1.K, np.float64)
    F = np.linalg.inv(K1).T @ Ess @ np.linalg.inv(K0)
    return F / max(abs(F).max(), 1e-12)
