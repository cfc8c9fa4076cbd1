"""7-parameter Helmert similarity: residuals + LS estimation.

Mirrors ref least_squares/absolute_orientation.py:9-147 (lmfit): params
(rx, ry, rz, tx, ty, tz, m) -> T = [m*R | t]; weighted residuals
x1 - T(x0); estimation via the jitted Gauss-Newton refiner in
ops/transforms (replaces lmfit.minimize).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops import transforms as tf


def get_T_from_params(params: np.ndarray) -> np.ndarray:
    """(rx, ry, rz, tx, ty, tz, m) -> 4x4 similarity transform
    (ref :9-29)."""
    return np.asarray(
        tf.helmert_params_to_matrix(jnp.asarray(params, jnp.float32)))


def compute_residuals(
    params: np.ndarray,
    x0: np.ndarray,
    x1: np.ndarray,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Flattened weighted residuals x1 - T(x0) (ref :31-77)."""
    r = np.asarray(
        tf.helmert_residuals(
            jnp.asarray(params, jnp.float32),
            jnp.asarray(x0, jnp.float32),
            jnp.asarray(x1, jnp.float32),
            None if weights is None else jnp.asarray(weights, jnp.float32),
        ))
    return r.reshape(-1)


def estimate_similarity_least_squares(
    x0: np.ndarray,
    x1: np.ndarray,
    weights: np.ndarray | None = None,
    T0: np.ndarray | None = None,
) -> tuple[np.ndarray, dict]:
    """Estimate T with x1 ~= T(x0). Linear Umeyama init + GN refinement.

    Returns (T (4, 4), report dict with rmse/residuals)."""
    x0 = np.asarray(x0, np.float64)
    x1 = np.asarray(x1, np.float64)
    # f32 device kernels only ever see centroid-relative values: world
    # coordinates are UTM-scale (~5e6 m) where float32 ULP is ~0.5 m
    c0 = x0.mean(axis=0)
    c1 = x1.mean(axis=0)
    x0c = x0 - c0
    x1c = x1 - c1
    if T0 is None:
        from icepy4d_tpu.ops.geometry_np import similarity_from_points

        Tc0 = np.asarray(
            similarity_from_points(x0c, x1c, with_scale=True), np.float64)
    else:
        T0 = np.asarray(T0, np.float64)
        Tc0 = np.eye(4)
        Tc0[:3, :3] = T0[:3, :3]
        Tc0[:3, 3] = T0[:3, 3] - c1 + T0[:3, :3] @ c0
    Tc = np.asarray(
        tf.refine_similarity_gauss_newton(
            jnp.asarray(Tc0, jnp.float32),
            jnp.asarray(x0c, jnp.float32),
            jnp.asarray(x1c, jnp.float32),
            weights=None if weights is None
            else jnp.asarray(weights, jnp.float32),
        ), np.float64)
    T = np.eye(4)
    T[:3, :3] = Tc[:3, :3]
    T[:3, 3] = c1 + Tc[:3, 3] - Tc[:3, :3] @ c0
    res = x1 - (x0 @ T[:3, :3].T + T[:3, 3])
    rmse = float(np.sqrt(np.mean(np.sum(res ** 2, axis=1))))
    return T, {"rmse": rmse, "residuals": res}
