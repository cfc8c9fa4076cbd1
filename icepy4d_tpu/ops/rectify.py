"""Stereo rectification (Fusiello/Trucco/Verri compact algorithm).

Rectifying both views ONCE turns dense plane sweeping into a pure
DISPARITY sweep: every depth hypothesis is an x-shift of the rectified
secondary image — elementwise ops instead of the per-plane gathers that
dominate a homography-based sweep on TPU (gathers are the slowest
primitive on the VPU; shifts are free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rectify_pair(K0: Array, E0: Array, K1: Array, E1: Array):
    """Compute rectifying transforms for two calibrated views.

    Returns dict with H0, H1 (3, 3) homographies mapping ORIGINAL image
    pixels to the rectified frame, K_new (3, 3), R_new (3, 3) world->rect
    rotation, baseline (scalar), and the rectified camera-0 center.
    """
    R0, t0 = E0[:3, :3], E0[:3, 3]
    R1, t1 = E1[:3, :3], E1[:3, 3]
    C0 = -R0.T @ t0
    C1 = -R1.T @ t1

    b = C1 - C0
    baseline = jnp.linalg.norm(b)
    e1 = b / jnp.maximum(baseline, 1e-12)
    # new z roughly along the mean optical axis, orthogonalized
    z_mean = 0.5 * (R0[2] + R1[2])
    e2 = jnp.cross(z_mean, e1)
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
    e3 = jnp.cross(e1, e2)
    R_new = jnp.stack([e1, e2, e3])       # world -> rectified cam

    K_new = 0.5 * (K0 + K1)
    K_new = K_new.at[0, 1].set(0.0)       # kill skew

    H0 = K_new @ R_new @ R0.T @ jnp.linalg.inv(K0)
    H1 = K_new @ R_new @ R1.T @ jnp.linalg.inv(K1)
    return {
        "H0": H0 / H0[2, 2],
        "H1": H1 / H1[2, 2],
        "K_new": K_new,
        "R_new": R_new,
        "baseline": baseline,
        "C0": C0,
    }


def disparity_to_depth(disp: Array, K_new: Array, baseline: Array) -> Array:
    """Z (rectified frame) = f * B / d."""
    return K_new[0, 0] * baseline / jnp.maximum(disp, 1e-9)


def depth_to_disparity(depth: Array, K_new: Array, baseline: Array) -> Array:
    return K_new[0, 0] * baseline / jnp.maximum(depth, 1e-9)


def rect_pixels_to_world(xy: Array, depth: Array, K_new: Array,
                         R_new: Array, C0: Array) -> Array:
    """Unproject rectified pixels (N, 2) + depths (N,) to world points."""
    ones = jnp.ones((xy.shape[0], 1), xy.dtype)
    rays = jnp.concatenate([xy, ones], -1) @ jnp.linalg.inv(K_new).T
    Xr = rays * depth[:, None]
    return Xr @ R_new + C0  # R_new.T @ Xr, row-vector form
