"""Projective geometry kernels (pure JAX, vmap/jit friendly).

Replaces the reference's OpenCV-backed geometry:
  - project_points        <- cv2.projectPoints        (ref sfm/geometry.py:79-103)
  - undistort_points      <- cv2.undistortPoints      (ref sfm/geometry.py:106-133)
  - distort/undistort model: full OpenCV rational model k1..k6,p1,p2
  - homogeneous helpers   <- ref utils/math.py:30-104

Conventions: points are float32 row-major (N, 2)/(N, 3); extrinsics is a
4x4 world->camera transform; K is the 3x3 upper-triangular intrinsic
matrix; dist is an 8-vector (k1, k2, p1, p2, k3, k4, k5, k6) — shorter
OpenCV vectors are zero-padded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def to_homogeneous(x: Array) -> Array:
    """(N, d) -> (N, d+1) with a trailing column of ones."""
    return jnp.concatenate([x, jnp.ones((*x.shape[:-1], 1), x.dtype)], axis=-1)


def from_homogeneous(x: Array, eps: float = 1e-12) -> Array:
    """(N, d+1) -> (N, d), dividing by the last coordinate."""
    w = x[..., -1:]
    return x[..., :-1] / jnp.where(jnp.abs(w) < eps, eps, w)


def skew_symmetric(v: Array) -> Array:
    """3-vector -> 3x3 cross-product matrix (batched over leading dims)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def pad_distortion(dist: Array) -> Array:
    """Zero-pad any OpenCV distortion vector (0/4/5/8 terms) to 8 terms."""
    dist = jnp.atleast_1d(jnp.asarray(dist, jnp.float32)).reshape(-1)
    n = dist.shape[0]
    if n >= 8:
        return dist[:8]
    return jnp.concatenate([dist, jnp.zeros((8 - n,), jnp.float32)])


def distort_normalized(xn: Array, dist: Array) -> Array:
    """Apply the OpenCV rational+tangential distortion model.

    xn: (..., 2) normalized image coords (x/z, y/z).
    dist: (8,) = (k1, k2, p1, p2, k3, k4, k5, k6).
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = (dist[i] for i in range(8))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (
        1.0 + k4 * r2 + k5 * r4 + k6 * r6
    )
    xy = x * y
    x_t = 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    y_t = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([x * radial + x_t, y * radial + y_t], axis=-1)


def undistort_normalized(xd: Array, dist: Array, iters: int = 20) -> Array:
    """Invert `distort_normalized` by fixed-point iteration (cv2-style).

    OpenCV's undistortPoints runs the same compensation loop; a fixed
    iteration count keeps the shape static for jit (lax.fori_loop).
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = (dist[i] for i in range(8))

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (
            1.0 + k4 * r2 + k5 * r4 + k6 * r6
        )
        xy = x * y
        dx = 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
        xr = (xd[..., 0] - dx) / radial
        yr = (xd[..., 1] - dy) / radial
        return jnp.stack([xr, yr], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def world_to_camera(points: Array, extrinsics: Array) -> Array:
    """(N, 3) world points -> (N, 3) camera-frame points via 4x4 extrinsics."""
    R = extrinsics[:3, :3]
    t = extrinsics[:3, 3]
    return points @ R.T + t


@jax.jit
def project_points(
    points: Array,
    K: Array,
    extrinsics: Array,
    dist: Array | None = None,
) -> Array:
    """Full pinhole projection with distortion (replaces cv2.projectPoints).

    points: (N, 3) world coords; returns (N, 2) pixel coords.
    """
    pc = world_to_camera(points, extrinsics)
    z = pc[..., 2:3]
    xn = pc[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    if dist is not None:
        xn = distort_normalized(xn, pad_distortion(dist))
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    u = fx * xn[..., 0] + s * xn[..., 1] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


@partial(jax.jit, static_argnames=("iters",))
def undistort_points(
    points: Array, K: Array, dist: Array, iters: int = 20
) -> Array:
    """Remove lens distortion from pixel coords, keeping K (cv2 P=K mode).

    points: (N, 2) distorted pixels -> (N, 2) undistorted pixels.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    sk = K[0, 1]
    xn = normalize_points(points, K)
    xu = undistort_normalized(xn, pad_distortion(dist), iters=iters)
    return jnp.stack(
        [xu[..., 0] * fx + sk * xu[..., 1] + cx,
         xu[..., 1] * fy + cy], axis=-1
    )


def normalize_points(points: Array, K: Array) -> Array:
    """Pixel coords -> normalized camera coords (honors K[0,1] skew —
    Agisoft XML calibrations put b1 there and project_points applies
    it, so the inverse must too)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    sk = K[0, 1]
    yn = (points[..., 1] - cy) / fy
    xn = (points[..., 0] - cx - sk * yn) / fx
    return jnp.stack([xn, yn], axis=-1)


def compute_reprojection_error(
    observed: Array, projected: Array, mask: Array | None = None
) -> tuple[Array, Array]:
    """Per-point residuals and masked RMSE (ref utils/math.py:76-104)."""
    res = projected - observed
    norm2 = jnp.sum(res * res, axis=-1)
    if mask is None:
        rmse = jnp.sqrt(jnp.mean(norm2))
    else:
        m = mask.astype(res.dtype)
        rmse = jnp.sqrt(jnp.sum(norm2 * m) / jnp.maximum(jnp.sum(m), 1.0))
    return res, rmse


def scale_intrinsics(K: Array, scale: Array | float) -> Array:
    """Scale fx, skew, fy, cx, cy by `scale` (ref sfm/geometry.py:
    161-173; skew is a pixel-unit quantity and scales with the rest)."""
    S = jnp.array(
        [[scale, scale, scale], [1.0, scale, scale], [1.0, 1.0, 1.0]],
        jnp.float32,
    )
    return K * S


def fundamental_from_cameras(
    K0: Array, E0: Array, K1: Array, E1: Array
) -> Array:
    """F matrix from two calibrated cameras (world->cam extrinsics E)."""
    R0, t0 = E0[:3, :3], E0[:3, 3]
    R1, t1 = E1[:3, :3], E1[:3, 3]
    # Relative transform cam0 -> cam1.
    R = R1 @ R0.T
    t = t1 - R @ t0
    E = skew_symmetric(t) @ R
    return jnp.linalg.inv(K1).T @ E @ jnp.linalg.inv(K0)
