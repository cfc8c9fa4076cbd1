"""Two-view epipolar geometry estimators (pure JAX, hypothesis-batched).

Replaces the reference's OpenCV / pydegensac calls:
  - eight_point / essential            <- cv2.findEssentialMat (ref sfm/geometry.py:31-76)
  - decompose_essential / recover_pose <- cv2.recoverPose
  - sampson_distance                   <- pydegensac sampson scoring
    (ref matching/geometric_verification.py:64-95)

Everything operates on fixed-size padded arrays with validity weights so
that hundreds of RANSAC hypotheses evaluate as one batched MXU-friendly
program (see ops/ransac.py for the driver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def hartley_normalization(x: Array, w: Array) -> tuple[Array, Array]:
    """Weighted Hartley normalization: similarity T s.t. T·x has zero mean
    and mean distance sqrt(2). x: (N, 2), w: (N,) weights in [0, 1].
    Returns (x_normalized (N, 2), T (3, 3))."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu = jnp.sum(x * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((x - mu) ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return (x - mu) * s, T


def eight_point(x0: Array, x1: Array, w: Array) -> Array:
    """Weighted normalized 8-point algorithm -> fundamental matrix.

    x0, x1: (N, 2) correspondences, w: (N,) weights (0 masks a row). With
    a minimal 8-row weight pattern this is the RANSAC hypothesis solver;
    with inlier weights it is the final refit. Rank-2 is enforced by SVD.
    """
    x0n, T0 = hartley_normalization(x0, w)
    x1n, T1 = hartley_normalization(x1, w)
    u0, v0 = x0n[:, 0], x0n[:, 1]
    u1, v1 = x1n[:, 0], x1n[:, 1]
    ones = jnp.ones_like(u0)
    # Constraint rows: x1ᵀ F x0 = 0.
    A = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1
    )
    A = A * w[:, None]
    _, V = jnp.linalg.eigh(A.T @ A)  # 9x9, smallest eigenvector first
    F = V[:, 0].reshape(3, 3)
    # Enforce rank 2.
    U, S, Vt = jnp.linalg.svd(F)
    F = U @ jnp.diag(S.at[2].set(0.0)) @ Vt
    F = T1.T @ F @ T0
    # Normalize scale (F is homogeneous).
    return F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1e-12, F[2, 2])


def essential_eight_point(x0n: Array, x1n: Array, w: Array) -> Array:
    """8-point on K-normalized coords + (1, 1, 0) singular-value projection."""
    E = eight_point(x0n, x1n, w)
    U, _, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def sampson_distance(F: Array, x0: Array, x1: Array) -> Array:
    """First-order geometric (Sampson) distance, same units as x (px).

    This is the scoring function pydegensac uses in the reference's
    geometric_verification (matching/geometric_verification.py:64-79).
    """
    x0h = jnp.concatenate([x0, jnp.ones((*x0.shape[:-1], 1), x0.dtype)], -1)
    x1h = jnp.concatenate([x1, jnp.ones((*x1.shape[:-1], 1), x1.dtype)], -1)
    Fx0 = x0h @ F.T  # (N, 3) = F @ x0
    Ftx1 = x1h @ F  # (N, 3) = Fᵀ @ x1
    num = jnp.sum(x1h * Fx0, axis=-1) ** 2
    den = Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def symmetric_epipolar_distance(F: Array, x0: Array, x1: Array) -> Array:
    """Symmetric point-to-epiline squared distance (pydegensac's
    `symmetric_error_check` companion metric)."""
    x0h = jnp.concatenate([x0, jnp.ones((*x0.shape[:-1], 1), x0.dtype)], -1)
    x1h = jnp.concatenate([x1, jnp.ones((*x1.shape[:-1], 1), x1.dtype)], -1)
    Fx0 = x0h @ F.T
    Ftx1 = x1h @ F
    e2 = jnp.sum(x1h * Fx0, axis=-1) ** 2
    d1 = e2 / jnp.maximum(Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2, 1e-12)
    d0 = e2 / jnp.maximum(Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2, 1e-12)
    return d0 + d1


def homography_dlt(x0: Array, x1: Array, w: Array) -> Array:
    """Weighted normalized 4-point DLT -> homography x1 ~ H x0.

    Same weighting convention as eight_point: a minimal 4-row weight
    pattern makes it the RANSAC hypothesis solver, inlier weights make
    it the refit. Used by the DEGENSAC-style plane-degeneracy check
    (reference relies on pydegensac's internal one,
    matching/geometric_verification.py:64-79).
    """
    x0n, T0 = hartley_normalization(x0, w)
    x1n, T1 = hartley_normalization(x1, w)
    u0, v0 = x0n[:, 0], x0n[:, 1]
    u1, v1 = x1n[:, 0], x1n[:, 1]
    ones = jnp.ones_like(u0)
    zeros = jnp.zeros_like(u0)
    # Two constraint rows per point from x1 x (H x0) = 0.
    rows_a = jnp.stack(
        [u0, v0, ones, zeros, zeros, zeros, -u1 * u0, -u1 * v0, -u1], -1
    )
    rows_b = jnp.stack(
        [zeros, zeros, zeros, u0, v0, ones, -v1 * u0, -v1 * v0, -v1], -1
    )
    A = jnp.concatenate([rows_a * w[:, None], rows_b * w[:, None]], axis=0)
    _, V = jnp.linalg.eigh(A.T @ A)
    H = V[:, 0].reshape(3, 3)
    H = jnp.linalg.solve(T1, H @ T0)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def homography_sym_transfer(H: Array, x0: Array, x1: Array) -> Array:
    """Symmetric transfer squared error (px^2) for x1 ~ H x0."""
    x0h = jnp.concatenate([x0, jnp.ones((*x0.shape[:-1], 1), x0.dtype)], -1)
    x1h = jnp.concatenate([x1, jnp.ones((*x1.shape[:-1], 1), x1.dtype)], -1)
    Hx0 = x0h @ H.T
    fwd = Hx0[..., :2] / jnp.where(
        jnp.abs(Hx0[..., 2:3]) < 1e-12, 1e-12, Hx0[..., 2:3])
    Hinv_x1 = jnp.linalg.solve(H, x1h.T).T
    bwd = Hinv_x1[..., :2] / jnp.where(
        jnp.abs(Hinv_x1[..., 2:3]) < 1e-12, 1e-12, Hinv_x1[..., 2:3])
    return jnp.sum((fwd - x1) ** 2, -1) + jnp.sum((bwd - x0) ** 2, -1)


def skew(v: Array) -> Array:
    """Cross-product matrix [v]_x."""
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def parallax_lines(H: Array, x0: Array, x1: Array) -> Array:
    """Per-correspondence epipolar-bundle lines (H x0) x x1, normalized
    so |l . e| is a point-line distance. Every off-plane correspondence
    lies on a line through the epipole e'."""
    x0h = jnp.concatenate([x0, jnp.ones((*x0.shape[:-1], 1), x0.dtype)], -1)
    x1h = jnp.concatenate([x1, jnp.ones((*x1.shape[:-1], 1), x1.dtype)], -1)
    lines = jnp.cross(x0h @ H.T, x1h)
    return lines / jnp.maximum(
        jnp.linalg.norm(lines[..., :2], axis=-1, keepdims=True), 1e-12)


def parallax_sq(H: Array, x0: Array, x1: Array) -> Array:
    """Squared plane-parallax |H x0 - x1|^2 in pixels per point."""
    x0h = jnp.concatenate([x0, jnp.ones((*x0.shape[:-1], 1), x0.dtype)], -1)
    Hx0 = x0h @ H.T
    Hx0_px = Hx0[..., :2] / jnp.where(
        jnp.abs(Hx0[..., 2:3]) < 1e-12, 1e-12, Hx0[..., 2:3])
    return jnp.sum((Hx0_px - x1) ** 2, -1)


def epipole_from_lines(H: Array, x0: Array, x1: Array,
                       weights: Array) -> Array:
    """Weighted least-squares intersection of the parallax line bundle
    (smallest eigenvector of sum w l l^T). With a 2-point one-hot weight
    vector this is the exact 2-line intersection — the minimal solver
    for plane-and-parallax epipole RANSAC."""
    lines = parallax_lines(H, x0, x1)
    M = jnp.einsum("ni,nj,n->ij", lines, lines, weights)
    _, V = jnp.linalg.eigh(M)
    return V[:, 0]


def fundamental_from_homography(
    H: Array, x0: Array, x1: Array, w_offplane: Array
) -> Array:
    """Plane-and-parallax: F = [e']_x H from off-plane correspondences.

    Each correspondence off the plane defines a line (H x0) x x1 through
    the epipole e'; e' is the least-squares intersection of the weighted
    line bundle (smallest eigenvector of sum w l l^T). This is the
    DEGENSAC model-recovery step the reference gets from pydegensac.
    """
    x0h = jnp.concatenate([x0, jnp.ones((*x0.shape[:-1], 1), x0.dtype)], -1)
    x1h = jnp.concatenate([x1, jnp.ones((*x1.shape[:-1], 1), x1.dtype)], -1)
    Hx0 = x0h @ H.T
    lines = jnp.cross(Hx0, x1h)
    # Normalize so |l . e| is the point-line distance for unit-ish e.
    lines = lines / jnp.maximum(
        jnp.linalg.norm(lines[..., :2], axis=-1, keepdims=True), 1e-12)
    # A line's direction is only as reliable as the point's parallax:
    # near-plane points (|Hx0 - x1| ~ noise) give noise-driven lines.
    # Weight by squared parallax so they fade — SATURATED at ~20 px so a
    # single gross mismatch (hundreds of px of fake "parallax") cannot
    # dominate the bundle before the IRLS reweighting can demote it.
    Hx0_px = Hx0[..., :2] / jnp.where(
        jnp.abs(Hx0[..., 2:3]) < 1e-12, 1e-12, Hx0[..., 2:3])
    parallax2 = jnp.sum((Hx0_px - x1) ** 2, -1)
    sat = 20.0 ** 2
    w_offplane = w_offplane * parallax2 / (1.0 + parallax2 / sat)

    def solve(w):
        M = jnp.einsum("ni,nj,n->ij", lines, lines, w)
        _, V = jnp.linalg.eigh(M)
        return V[:, 0]

    # IRLS: one LS pass, then down-weight lines far from the epipole
    # (off-plane sets are small; a single bad line can drag plain LS).
    e1 = solve(w_offplane)
    for _ in range(2):
        d = jnp.abs(lines @ e1) / jnp.maximum(
            jnp.linalg.norm(e1[:2]), 1e-12)
        scale = jnp.sum(d * w_offplane) / jnp.maximum(
            jnp.sum(w_offplane), 1e-12)
        w = w_offplane / (1.0 + (d / jnp.maximum(scale, 1e-12)) ** 2)
        e1 = solve(w)
    F = skew(e1) @ H
    return F / jnp.maximum(jnp.abs(F).max(), 1e-12)


def decompose_essential(E: Array) -> tuple[Array, Array]:
    """E -> 4 candidate poses. Returns (Rs (4, 3, 3), ts (4, 3))."""
    U, _, Vt = jnp.linalg.svd(E)
    # Keep rotations proper.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _cheirality_depths(R: Array, t: Array, x0n: Array, x1n: Array) -> tuple[Array, Array]:
    """Depths of midpoint-free linear triangulation for pose (R, t) with
    P0 = [I|0], P1 = [R|t]; x*n are K-normalized coords. Vectorized DLT via
    the two-row cross-product formulation solved in closed form."""
    P0 = jnp.concatenate([jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], 1)
    P1 = jnp.concatenate([R, t[:, None]], 1)

    def tri_one(a, b):
        A = jnp.stack(
            [
                a[0] * P0[2] - P0[0],
                a[1] * P0[2] - P0[1],
                b[0] * P1[2] - P1[0],
                b[1] * P1[2] - P1[1],
            ]
        )
        _, V = jnp.linalg.eigh(A.T @ A)
        X = V[:, 0]
        X = X / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        z0 = X[2]
        z1 = R[2] @ X[:3] + t[2]
        return z0, z1

    return jax.vmap(tri_one)(x0n, x1n)


def recover_pose(
    E: Array, x0n: Array, x1n: Array, w: Array
) -> tuple[Array, Array, Array]:
    """Select the (R, t) with the best cheirality vote (cv2.recoverPose).

    Returns (R, t, front_mask) where front_mask flags correspondences in
    front of both cameras for the winning pose.
    """
    Rs, ts = decompose_essential(E)

    def vote(R, t):
        z0, z1 = _cheirality_depths(R, t, x0n, x1n)
        front = (z0 > 0) & (z1 > 0)
        return jnp.sum(front.astype(jnp.float32) * w), front

    votes, fronts = jax.vmap(vote)(Rs, ts)
    best = jnp.argmax(votes)
    return Rs[best], ts[best], fronts[best]


def pnp_dlt(pts3d: Array, pts2d_n: Array, w: Array) -> tuple[Array, Array]:
    """Direct linear transform PnP from ≥6 points (K-normalized 2D coords).

    Solves for P = [R|t] up to scale via the 2n×12 homogeneous system,
    then projects the left 3x3 block onto SO(3) (Procrustes) and fixes the
    scale/sign so depths are positive. Hypothesis solver for
    ops.ransac.ransac_pnp (replaces cv2.solvePnPRansac, ref
    sfm/absolute_orientation.py:18-50).
    Returns (R (3, 3), t (3,)).
    """
    X = jnp.concatenate([pts3d, jnp.ones((pts3d.shape[0], 1), pts3d.dtype)], 1)
    zeros = jnp.zeros_like(X)
    u = pts2d_n[:, 0:1]
    v = pts2d_n[:, 1:2]
    rows_u = jnp.concatenate([X, zeros, -u * X], axis=1)  # (N, 12)
    rows_v = jnp.concatenate([zeros, X, -v * X], axis=1)
    A = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)
    _, V = jnp.linalg.eigh(A.T @ A)
    P = V[:, 0].reshape(3, 4)
    M = P[:, :3]
    # Fix sign so that the mean depth of weighted points is positive.
    depths = X @ P[2]
    sgn = jnp.sign(jnp.sum(depths * w) + 1e-12)
    P = P * sgn
    M = P[:, :3]
    # Scale: ||M|| should equal ||R|| = sqrt(3) in Frobenius norm.
    scale = jnp.sqrt(3.0) / jnp.maximum(jnp.linalg.norm(M), 1e-12)
    M = M * scale
    t = P[:, 3] * scale
    # Project M onto SO(3).
    U, _, Vt = jnp.linalg.svd(M)
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.linalg.det(U @ Vt)], M.dtype))
    R = U @ D @ Vt
    return R, t
