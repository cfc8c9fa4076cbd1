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


def rectify_pair(K0: Array, E0: Array, K1: Array, E1: Array,
                 image_size: tuple | None = None):
    """Compute rectifying transforms for two calibrated views.

    Returns dict with H0, H1 (3, 3) homographies mapping ORIGINAL image
    pixels to the rectified frame, K_new (3, 3) rectified camera-0
    intrinsics, R_new (3, 3) world->rect rotation, baseline (scalar),
    the camera-0 center, and disp_offset.

    image_size (w, h): when given, each rectified frame is re-centered
    on its own image content (convergent rigs otherwise map entirely
    outside the window). The per-camera horizontal shifts differ, so the
    stereo relation becomes d = f*B/Z + disp_offset — the helpers below
    take the offset.
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
    H0 = H0 / H0[2, 2]
    H1 = H1 / H1[2, 2]
    disp_offset = jnp.asarray(0.0)
    if image_size is not None:
        w, h = image_size
        ctr = jnp.asarray([w / 2.0, h / 2.0, 1.0])

        def mapped(Hm):
            c = Hm @ ctr
            return c[:2] / c[2]

        c0 = mapped(H0)
        c1 = mapped(H1)
        tx0 = w / 2.0 - c0[0]
        tx1 = w / 2.0 - c1[0]
        # vertical shift must be COMMON (rows stay epipolar-aligned)
        ty = h / 2.0 - 0.5 * (c0[1] + c1[1])
        T0 = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]
                         ).at[0, 2].set(tx0).at[1, 2].set(ty)
        T1 = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]
                         ).at[0, 2].set(tx1).at[1, 2].set(ty)
        H0 = T0 @ H0
        H1 = T1 @ H1
        K_new = K_new.at[0, 2].add(tx0).at[1, 2].add(ty)
        disp_offset = tx0 - tx1
    return {
        "H0": H0,
        "H1": H1,
        "K_new": K_new,
        "R_new": R_new,
        "baseline": baseline,
        "C0": C0,
        "disp_offset": disp_offset,
    }


def disparity_to_depth(disp: Array, K_new: Array, baseline: Array,
                       disp_offset: Array | float = 0.0) -> Array:
    """Z (rectified frame) = f * B / (d - disp_offset)."""
    d = disp - disp_offset
    return K_new[0, 0] * baseline / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)


def depth_to_disparity(depth: Array, K_new: Array, baseline: Array,
                       disp_offset: Array | float = 0.0) -> Array:
    return K_new[0, 0] * baseline / jnp.maximum(depth, 1e-9) + disp_offset


def rect_pixels_to_world(xy: Array, depth: Array, K_new: Array,
                         R_new: Array, C0: Array) -> Array:
    """Unproject rectified pixels (N, 2) + depths (N,) to world points."""
    ones = jnp.ones((xy.shape[0], 1), xy.dtype)
    rays = jnp.concatenate([xy, ones], -1) @ jnp.linalg.inv(K_new).T
    Xr = rays * depth[:, None]
    return Xr @ R_new + C0  # R_new.T @ Xr, row-vector form
