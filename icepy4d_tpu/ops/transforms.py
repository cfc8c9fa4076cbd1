"""Rigid/similarity transform math (pure JAX).

Replaces the vendored Gohlke transformations library (ref
thirdparty/transformations.py): Euler <-> rotation matrix (the 'sxyz'
convention used by the reference for omega/phi/kappa), quaternions, and
`affine_matrix_from_points` (Procrustes/Umeyama SVD) which is the
reference's absolute-orientation solver (thirdparty/transformations.py:908).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Euler angles ('sxyz' static frame convention, as Gohlke's default)
# ---------------------------------------------------------------------------

def euler_matrix(ai: Array, aj: Array, ak: Array) -> Array:
    """Rotation matrix from static-xyz Euler angles (omega, phi, kappa).

    Matches Gohlke euler_matrix(ai, aj, ak, 'sxyz')[:3, :3]:
    R = Rz(ak) @ Ry(aj) @ Rx(ai).
    """
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [
            jnp.stack([cj * ck, sj * sc - cs, sj * cc + ss], axis=-1),
            jnp.stack([cj * sk, sj * ss + cc, sj * cs - sc], axis=-1),
            jnp.stack([-sj, cj * si, cj * ci], axis=-1),
        ],
        axis=-2,
    )


def euler_from_matrix(R: Array, eps: float = 1e-8) -> tuple[Array, Array, Array]:
    """Static-xyz Euler angles from a rotation matrix (inverse of above)."""
    cy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    safe = cy > eps
    ax = jnp.where(
        safe,
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
    )
    ay = jnp.arctan2(-R[..., 2, 0], cy)
    az = jnp.where(safe, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]), 0.0)
    return ax, ay, az


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quaternion_from_matrix(R: Array) -> Array:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the 4x4 symmetric-matrix eigen trick's closed form via the four
    candidate square roots, selected by the largest diagonal combination
    (numerically stable, jit-friendly with jnp.where).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, one per branch.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0)], axis=-1)

    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
    q1 = jnp.stack(
        [(m21 - m12) / s1, s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1],
        axis=-1)

    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4, (m12 + m21) / s2],
        axis=-1)

    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3 / 4],
        axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def matrix_from_quaternion(q: Array) -> Array:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                       2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                       2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                       1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Rodrigues (axis-angle) — replaces cv2.Rodrigues
# ---------------------------------------------------------------------------

def rodrigues_to_matrix(rvec: Array, eps: float = 1e-12) -> Array:
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    k = rvec / jnp.where(theta < eps, 1.0, theta)
    K = jnp.zeros((*rvec.shape[:-1], 3, 3), rvec.dtype)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)
    return jnp.where(th < eps, eye, R)


def matrix_to_rodrigues(R: Array, eps: float = 1e-12) -> Array:
    """Rotation matrix -> axis-angle, via the quaternion.

    The classic antisymmetric-part formula collapses at theta ~ pi
    (v = R - R^T is exactly zero for e.g. diag(1,-1,-1), yielding a
    zero rvec that silently resets a 180-degree camera pose — fatal as
    a bundle-adjustment initialization). The quaternion route is exact
    for ALL angles: theta = 2*atan2(|q_xyz|, q_w), axis = q_xyz/|q_xyz|,
    with the theta->0 limit handled by the same expression
    (axis*theta -> 2*q_xyz)."""
    q = quaternion_from_matrix(R)
    # enforce w >= 0 so theta lands in [0, pi]
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    w = q[..., 0]
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n < eps, 2.0, theta / jnp.where(n < eps, 1.0, n))
    return xyz * scale[..., None]


# ---------------------------------------------------------------------------
# Procrustes / Umeyama — affine_matrix_from_points(shear=False)
# ---------------------------------------------------------------------------

def similarity_from_points(
    v0: Array, v1: Array, with_scale: bool = True,
    weights: Array | None = None,
) -> Array:
    """Least-squares similarity transform T (4x4) with v1 ~= T @ v0.

    v0, v1: (N, 3) corresponding points. Umeyama's method — the SVD
    route of Gohlke's affine_matrix_from_points(shear=False, scale=...)
    (ref thirdparty/transformations.py:908-1008), the reference's
    absolute-orientation solver.
    """
    if weights is None:
        w = jnp.ones((v0.shape[0],), v0.dtype)
    else:
        w = weights.astype(v0.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu0 = jnp.sum(v0 * w[:, None], axis=0) / wsum
    mu1 = jnp.sum(v1 * w[:, None], axis=0) / wsum
    x0 = v0 - mu0
    x1 = v1 - mu1
    cov = (x1 * w[:, None]).T @ x0 / wsum
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], v0.dtype)).at[2, 2].set(d)
    R = U @ D @ Vt
    var0 = jnp.sum(w[:, None] * x0 * x0) / wsum
    s = jnp.where(
        with_scale,
        (S[0] + S[1] + S[2] * d) / jnp.maximum(var0, 1e-12),
        1.0,
    )
    t = mu1 - s * (R @ mu0)
    T = jnp.eye(4, dtype=v0.dtype)
    T = T.at[:3, :3].set(s * R)
    T = T.at[:3, 3].set(t)
    return T


def apply_transform(T: Array, points: Array) -> Array:
    """Apply a 4x4 transform to (N, 3) points."""
    return points @ T[:3, :3].T + T[:3, 3]


def helmert_params_to_matrix(params: Array) -> Array:
    """7-param Helmert (rx, ry, rz, tx, ty, tz, m) -> 4x4 T = [mR | t].

    Mirrors the reference's lmfit parametrization
    (least_squares/absolute_orientation.py:9-29).
    """
    R = euler_matrix(params[0], params[1], params[2])
    T = jnp.eye(4, dtype=params.dtype)
    T = T.at[:3, :3].set(params[6] * R)
    T = T.at[:3, 3].set(params[3:6])
    return T


def helmert_residuals(params: Array, v0: Array, v1: Array,
                      weights: Array | None = None) -> Array:
    """Weighted residuals v1 - T(params) @ v0, flattened (ref :31-77)."""
    r = v1 - apply_transform(helmert_params_to_matrix(params), v0)
    if weights is not None:
        r = r * weights
    return r.reshape(-1)


@partial(jax.jit, static_argnames=("iters",))
def refine_similarity_gauss_newton(
    T0: Array, v0: Array, v1: Array, iters: int = 10,
    weights: Array | None = None,
) -> Array:
    """Refine a similarity transform by Gauss-Newton on the 7 Helmert params.

    Replaces the reference's lmfit Levenberg-Marquardt refinement
    (sfm/absolute_orientation.py:181-242) with an on-device GN loop
    (jacobians via jax.jacfwd, tiny 7x7 normal system).
    """
    R0 = T0[:3, :3]
    s0 = jnp.cbrt(jnp.maximum(jnp.linalg.det(R0), 1e-12))
    ax, ay, az = euler_from_matrix(R0 / s0)
    p = jnp.array(
        [ax, ay, az, T0[0, 3], T0[1, 3], T0[2, 3], s0], T0.dtype
    )

    def body(_, p):
        r = helmert_residuals(p, v0, v1, weights)
        J = jax.jacfwd(helmert_residuals)(p, v0, v1, weights)
        JtJ = J.T @ J + 1e-9 * jnp.eye(7, dtype=p.dtype)
        return p - jnp.linalg.solve(JtJ, J.T @ r)

    p = jax.lax.fori_loop(0, iters, body, p)
    return helmert_params_to_matrix(p)
