"""Multi-view triangulation kernels (pure JAX, batched over points).

Replaces the reference's per-point Python loops (ref
thirdparty/triangulation.py: linear_LS_triangulation:10,
iterative_LS_triangulation:79, linear_eigen:230 — the hot loop noted in
SURVEY §3.1). Every solver here is vmapped over the point axis, so a
whole epoch's correspondences triangulate in one fused XLA program.

Conventions: P are 3x4 projection matrices (K @ [R|t]); image points are
(N, 2) pixel (or normalized) coords; all float32 by default, float64
optional for the normal-equation solves on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _dlt_system_two_view(u0: Array, u1: Array, P0: Array, P1: Array) -> Array:
    """4x4 homogeneous DLT system rows for one correspondence."""
    return jnp.stack(
        [
            u0[0] * P0[2] - P0[0],
            u0[1] * P0[2] - P0[1],
            u1[0] * P1[2] - P1[0],
            u1[1] * P1[2] - P1[1],
        ]
    )


@jax.jit
def linear_eigen_triangulation(
    u0: Array, u1: Array, P0: Array, P1: Array
) -> Array:
    """Homogeneous DLT triangulation (smallest eigenvector of AᵀA).

    u0, u1: (N, 2). Returns (N, 3). Equivalent of the reference's
    linear_eigen_triangulation (thirdparty/triangulation.py:230,
    cv2.triangulatePoints), but batched: one 4x4 eigh per point, all
    solved in a single vmapped kernel.
    """

    def solve_one(a, b):
        A = _dlt_system_two_view(a, b, P0, P1)
        _, V = jnp.linalg.eigh(A.T @ A)
        X = V[:, 0]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(solve_one)(u0, u1)


def linear_ls_triangulation(
    u0: Array, u1: Array, P0: Array, P1: Array
) -> Array:
    """Inhomogeneous linear LS triangulation (4 eqs, 3 unknowns).

    Matches the reference's linear_LS_triangulation
    (thirdparty/triangulation.py:10): solve A x = b with A the first 3
    columns of the DLT rows and b = -(4th column).
    """

    def solve_one(a, b):
        S = _dlt_system_two_view(a, b, P0, P1)
        A = S[:, :3]
        rhs = -S[:, 3]
        AtA = A.T @ A + 1e-12 * jnp.eye(3, dtype=S.dtype)
        return jnp.linalg.solve(AtA, A.T @ rhs)

    return jax.vmap(solve_one)(u0, u1)


@partial(jax.jit, static_argnames=("iters", "tolerance"))
def iterative_ls_triangulation(
    u0: Array,
    u1: Array,
    P0: Array,
    P1: Array,
    iters: int = 10,
    tolerance: float = 1.0e-4,
) -> tuple[Array, Array]:
    """Hartley–Sturm iteratively reweighted LS triangulation.

    The reference's workhorse (thirdparty/triangulation.py:79, called per
    point from sfm/triangulation.py:71-96). Reweights the DLT rows by the
    inverse projective depth each iteration so the residual approximates
    image-plane (not algebraic) error. A fixed `iters` count replaces the
    data-dependent convergence exit, keeping shapes static for jit; the
    returned status mirrors the reference's semantics:
    status = 1 iff the point converged AND is in front of both cameras.
    Convergence is relative (|Δdepth| <= tolerance·|depth|): the reference
    compares raw float64 depth deltas to 3e-5, which float32 cannot meet
    at typical scene depths.

    Returns (points (N, 3), status (N,) int32).
    """

    def solve_one(a, b):
        S = _dlt_system_two_view(a, b, P0, P1)
        A0 = S[:, :3]
        b0 = -S[:, 3]

        def body(carry, _):
            x, w0, w1, _conv = carry
            # Projective depths under current estimate.
            d0 = P0[2, :3] @ x + P0[2, 3]
            d1 = P1[2, :3] @ x + P1[2, 3]
            conv = (jnp.abs(w0 - d0) <= tolerance * jnp.abs(d0)) & (
                jnp.abs(w1 - d1) <= tolerance * jnp.abs(d1)
            )
            w0n = jnp.where(jnp.abs(d0) < 1e-12, 1e-12, d0)
            w1n = jnp.where(jnp.abs(d1) < 1e-12, 1e-12, d1)
            w = jnp.stack([1.0 / w0n, 1.0 / w0n, 1.0 / w1n, 1.0 / w1n])
            Aw = A0 * w[:, None]
            bw = b0 * w
            AtA = Aw.T @ Aw + 1e-12 * jnp.eye(3, dtype=S.dtype)
            x_new = jnp.linalg.solve(AtA, Aw.T @ bw)
            return (x_new, w0n, w1n, conv), None

        x0 = jnp.linalg.solve(
            A0.T @ A0 + 1e-12 * jnp.eye(3, dtype=S.dtype), A0.T @ b0
        )
        (x, _, _, conv), _ = jax.lax.scan(
            body, (x0, jnp.float32(1.0), jnp.float32(1.0), False),
            None, length=iters,
        )
        d0 = P0[2, :3] @ x + P0[2, 3]
        d1 = P1[2, :3] @ x + P1[2, 3]
        status = (conv & (d0 > 0) & (d1 > 0)).astype(jnp.int32)
        return x, status

    return jax.vmap(solve_one)(u0, u1)


@jax.jit
def triangulate_nview(us: Array, Ps: Array, mask: Array | None = None) -> Array:
    """N-view DLT: us (V, N, 2) observations, Ps (V, 3, 4), mask (V, N).

    Stacks 2 DLT rows per view and solves the homogeneous system by the
    smallest eigenvector of the (3+1)x(3+1) normal matrix. Invalid
    observations (mask=False) contribute zero rows.
    """
    V = us.shape[0]
    if mask is None:
        mask = jnp.ones(us.shape[:2], bool)

    def solve_one(u_views, m_views):
        # u_views: (V, 2), m_views: (V,)
        rows = []
        for v in range(V):
            r0 = u_views[v, 0] * Ps[v, 2] - Ps[v, 0]
            r1 = u_views[v, 1] * Ps[v, 2] - Ps[v, 1]
            w = m_views[v].astype(r0.dtype)
            rows.extend([r0 * w, r1 * w])
        A = jnp.stack(rows)  # (2V, 4)
        _, Vv = jnp.linalg.eigh(A.T @ A)
        X = Vv[:, 0]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(solve_one, in_axes=(1, 1))(us, mask)


def interpolate_bilinear(image: Array, xy: Array) -> Array:
    """Bilinear sample `image` (H, W[, C]) at pixel coords xy (N, 2).

    Replaces the reference's interpolate_point_colors / bilinear_interpolate
    (sfm/interpolate_colors.py:54-88) with a gather-based batched kernel.
    Out-of-bounds coordinates clamp to the border.
    """
    chan = image.ndim == 3
    img = image if chan else image[..., None]
    H, W = img.shape[:2]
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out if chan else out[..., 0]
