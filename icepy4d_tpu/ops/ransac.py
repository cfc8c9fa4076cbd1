"""Hypothesis-parallel RANSAC (pure JAX).

The reference reaches native RANSAC three ways — pydegensac
findFundamentalMatrix (matching/geometric_verification.py:64-79),
cv2.findEssentialMat+recoverPose (sfm/geometry.py:31-76), and
cv2.solvePnPRansac (sfm/absolute_orientation.py:18-50). All are
sequential C++ loops. Here every hypothesis is solved and scored
simultaneously: sampling is Gumbel-top-k over the validity mask (one
(H, N) tensor op), the minimal solver is vmapped over hypotheses, and
scoring is one (H, N) residual matrix — the shape XLA tiles best.

All entry points take padded (N, 2) arrays + a validity mask and return
fixed-shape results with an inlier mask, so they compose with jit/vmap
upstream (tile batches) and downstream (triangulation).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from icepy4d_tpu.ops import epipolar

Array = jax.Array


def sample_minimal_sets(
    key: Array, mask: Array, n_hypotheses: int, sample_size: int
) -> Array:
    """(H, S) index sets drawn from valid rows, without replacement.

    Gumbel-top-k trick: add iid Gumbel noise to log-mask and take the
    top-S per hypothesis — fully batched, no per-hypothesis permutation.
    """
    n = mask.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hypotheses, n))
    _, idx = jax.lax.top_k(logits[None, :] + g, sample_size)
    return idx


def _one_hot_weights(idx: Array, n: int) -> Array:
    """Minimal-sample index set (S,) -> weight vector (N,) with ones."""
    return jnp.zeros((n,), jnp.float32).at[idx].set(1.0)


def ransac(
    key: Array,
    solver: Callable[[Array], Array],
    residual: Callable[[Array], Array],
    mask: Array,
    *,
    sample_size: int,
    n_hypotheses: int,
    threshold: float,
) -> tuple[Array, Array, Array]:
    """Generic engine: returns (best_model, inlier_mask, n_inliers).

    solver(weights (N,)) -> model pytree for a weighted minimal set;
    residual(model) -> (N,) squared residuals in threshold units.
    """
    n = mask.shape[0]
    idx = sample_minimal_sets(key, mask, n_hypotheses, sample_size)
    weights = jax.vmap(_one_hot_weights, in_axes=(0, None))(idx, n)  # (H, N)
    models = jax.vmap(solver)(weights)  # pytree with leading H
    res = jax.vmap(residual)(models)  # (H, N)
    inl = (res < threshold**2) & mask[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(scores)
    best_model = jax.tree.map(lambda a: a[best], models)
    return best_model, inl[best], scores[best]


# ---------------------------------------------------------------------------
# Fundamental matrix — replaces pydegensac/MAGSAC geometric verification
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_hypotheses", "refit_iters"))
def ransac_fundamental(
    key: Array,
    x0: Array,
    x1: Array,
    mask: Array,
    threshold: float = 1.5,
    n_hypotheses: int = 512,
    refit_iters: int = 2,
) -> tuple[Array, Array]:
    """F-matrix RANSAC with Sampson scoring + iterated inlier refit.

    Mirrors the reference's geometric_verification semantics
    (matching/geometric_verification.py:11-102): px threshold on Sampson
    distance, least-squares refit on the consensus set. Returns
    (F (3, 3), inlier mask (N,)).
    """
    solver = lambda w: epipolar.eight_point(x0, x1, w)
    residual = lambda F: epipolar.sampson_distance(F, x0, x1)
    F, inliers, _ = ransac(
        key, solver, residual, mask,
        sample_size=8, n_hypotheses=n_hypotheses, threshold=threshold,
    )

    def refit(_, carry):
        F, inl = carry
        F = epipolar.eight_point(x0, x1, inl.astype(jnp.float32))
        d = epipolar.sampson_distance(F, x0, x1)
        return F, (d < threshold**2) & mask

    F, inliers = jax.lax.fori_loop(0, refit_iters, refit, (F, inliers))
    return F, inliers


# ---------------------------------------------------------------------------
# Essential matrix + pose — replaces findEssentialMat + recoverPose
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_essential_pose(
    key: Array,
    x0: Array,
    x1: Array,
    K0: Array,
    K1: Array,
    mask: Array,
    threshold_px: float = 1.0,
    n_hypotheses: int = 512,
) -> tuple[Array, Array, Array, Array]:
    """Essential-matrix RANSAC + cheirality pose recovery.

    Pixel coords in, pose out. The reference normalizes the px threshold
    by the mean focal (sfm/geometry.py:49-52); we score Sampson distance
    in normalized units against the same scaled threshold. Returns
    (R, t, E, inlier_mask): R, t transform cam0-frame points to
    cam1-frame (x1 = R @ x0 + t), t unit-norm.
    """
    f_mean = (K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1]) / 4.0
    th_n = threshold_px / f_mean

    def norm(x, K):
        return jnp.stack(
            [(x[..., 0] - K[0, 2]) / K[0, 0], (x[..., 1] - K[1, 2]) / K[1, 1]],
            axis=-1,
        )

    x0n = norm(x0, K0)
    x1n = norm(x1, K1)

    solver = lambda w: epipolar.essential_eight_point(x0n, x1n, w)
    residual = lambda E: epipolar.sampson_distance(E, x0n, x1n)
    E, inliers, _ = ransac(
        key, solver, residual, mask,
        sample_size=8, n_hypotheses=n_hypotheses, threshold=th_n,
    )
    # Refit on consensus and re-score once.
    E = epipolar.essential_eight_point(x0n, x1n, inliers.astype(jnp.float32))
    d = epipolar.sampson_distance(E, x0n, x1n)
    inliers = (d < th_n**2) & mask
    R, t, front = epipolar.recover_pose(E, x0n, x1n, inliers.astype(jnp.float32))
    return R, t, E, inliers & front


# ---------------------------------------------------------------------------
# PnP — replaces cv2.solvePnPRansac (space resection)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_pnp(
    key: Array,
    pts3d: Array,
    pts2d: Array,
    K: Array,
    mask: Array,
    threshold_px: float = 3.0,
    n_hypotheses: int = 256,
) -> tuple[Array, Array, Array]:
    """DLT-PnP RANSAC. Returns (R, t, inlier_mask) with x_cam = R X + t."""
    x2n = jnp.stack(
        [
            (pts2d[..., 0] - K[0, 2]) / K[0, 0],
            (pts2d[..., 1] - K[1, 2]) / K[1, 1],
        ],
        axis=-1,
    )
    th_n = threshold_px / ((K[0, 0] + K[1, 1]) / 2.0)

    def solver(w):
        R, t = epipolar.pnp_dlt(pts3d, x2n, w)
        return jnp.concatenate([R, t[:, None]], axis=1)  # (3, 4)

    def residual(P):
        pc = pts3d @ P[:, :3].T + P[:, 3]
        z = jnp.where(jnp.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
        proj = pc[..., :2] / z[..., None]
        behind = pc[..., 2] <= 0
        r2 = jnp.sum((proj - x2n) ** 2, axis=-1)
        return jnp.where(behind, jnp.inf, r2)

    P, inliers, _ = ransac(
        key, solver, residual, mask,
        sample_size=6, n_hypotheses=n_hypotheses, threshold=th_n,
    )
    # Refit on the consensus set.
    R, t = epipolar.pnp_dlt(pts3d, x2n, inliers.astype(jnp.float32))
    P = jnp.concatenate([R, t[:, None]], axis=1)
    r = residual(P)
    inliers = (r < th_n**2) & mask
    return R, t, inliers
