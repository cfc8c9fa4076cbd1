"""Sparse Levenberg–Marquardt bundle adjustment with Schur elimination.

Replaces the reference's Agisoft Metashape dependency
(metashape/metashape.py:109-380, chunk.optimizeCameras at :195-196) with
a native TPU program. Design:

- Observations live on a dense (P points x C cameras) grid with validity
  weights — static shapes, ideal for vmapped Jacobians on the MXU. The
  stereo-glacier workload is naturally dense (every tie point is seen by
  ~all cameras).
- Per-observation Jacobians come from `jax.jacfwd` of the full OpenCV
  projection (rational distortion model), vmapped over the grid — no
  hand-derived derivatives to get wrong.
- Normal equations are never materialized globally: point blocks V_p are
  eliminated via the Schur complement, the reduced camera system
  (C * B dims, B = 6 + #free intrinsics) is solved densely, and point
  updates are back-substituted — the standard sparse-BA structure, with
  the point reduction expressed as one einsum over the grid.
- The LM loop is a `lax.while_loop`: the whole optimization is ONE XLA
  program (batchable over epochs with vmap).

Weighting mirrors Metashape's accuracy semantics
(metashape/metashape.py:144-196): tie-point/marker projections weighted
by 1/sigma_px, marker world locations by 1/sigma_m (point priors),
camera centers by 1/sigma_m (pose priors).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from icepy4d_tpu.ops.geometry import distort_normalized
from icepy4d_tpu.ops.transforms import rodrigues_to_matrix

Array = jax.Array

# intrinsic vector layout used throughout: [fx, fy, cx, cy, k1..k6? ->
# (k1, k2, p1, p2, k3, k4, k5, k6)] = 12 entries
N_INTR = 12


class BAProblem(NamedTuple):
    """Static-shape BA problem on a (P, C) observation grid."""

    cam_theta: Array      # (C, 6)  [rvec, tvec] world->cam
    intrinsics: Array     # (C, 12) [fx, fy, cx, cy, dist8]
    points: Array         # (P, 3)
    obs_xy: Array         # (P, C, 2) pixel observations
    obs_w: Array          # (P, C) 1/sigma_px; 0 = missing observation
    pt_prior: Array       # (P, 3) world priors (markers/GCPs)
    pt_prior_w: Array     # (P,) 1/sigma_m; 0 = no prior
    cam_prior: Array      # (C, 3) camera-center priors
    cam_prior_w: Array    # (C,) 1/sigma_m; 0 = no prior
    cam_fixed: Array      # (C,) bool — freeze these cameras


class BAResult(NamedTuple):
    cam_theta: Array
    intrinsics: Array
    points: Array
    cost: Array           # final objective: 0.5 * sum(weighted r^2),
                          # or the Huber objective when robust_delta set
    initial_cost: Array
    iterations: Array
    lam: Array


def _theta_split(theta: Array, intr_base: Array, free_intr: tuple):
    rvec, tvec = theta[:3], theta[3:6]
    intr = intr_base
    if free_intr:
        intr = intr.at[jnp.asarray(free_intr)].set(theta[6:])
    return rvec, tvec, intr


def _project_resid(theta: Array, X: Array, intr_base: Array, xy: Array,
                   w: Array, free_intr: tuple) -> Array:
    """Weighted 2-vector reprojection residual for one observation.

    xn is clamped: a point near a NON-observing camera's principal
    plane (w=0) would otherwise overflow the distortion polynomial to
    inf, and 0 * inf = NaN poisons every normal-equation build. |xn|
    <= 32 covers any physical field of view; the final where() makes
    masked rows EXACTLY zero even if numerics misbehave."""
    rvec, tvec, intr = _theta_split(theta, intr_base, free_intr)
    R = rodrigues_to_matrix(rvec)
    Xc = R @ X + tvec
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    xn = jnp.clip(Xc[:2] / z, -32.0, 32.0)
    xd = distort_normalized(xn[None], intr[4:])[0]
    px = intr[:2] * xd + intr[2:4]
    return jnp.where(w > 0, (px - xy) * w, 0.0)


def _center_resid(theta: Array, prior: Array, w: Array) -> Array:
    """Weighted camera-center prior residual (3,)."""
    R = rodrigues_to_matrix(theta[:3])
    center = -R.T @ theta[3:6]
    return (center - prior) * w


def _pt_prior_resid(X: Array, prior: Array, w: Array) -> Array:
    return (X - prior) * w


def _huber_rho(sq_norm: Array, delta: float) -> Array:
    """Huber loss on a SQUARED residual norm (per observation)."""
    n = jnp.sqrt(jnp.maximum(sq_norm, 1e-24))
    return jnp.where(n <= delta, sq_norm,
                     2.0 * delta * n - delta ** 2)


def _huber_irls_weight(sq_norm: Array, delta: float) -> Array:
    """sqrt(rho'(r)) IRLS factor: 1 inside the inlier band, delta/|r|
    outside — multiplies residuals AND Jacobians (Triggs et al. §4)."""
    n = jnp.sqrt(jnp.maximum(sq_norm, 1e-24))
    return jnp.sqrt(jnp.minimum(1.0, delta / n))


def _build_cost(prob: BAProblem, robust_delta: float | None = None):
    def cost_fn(cam_theta, intrinsics, points):
        r_obs = jax.vmap(
            lambda X, xyc, wc: jax.vmap(
                _project_resid, in_axes=(0, None, 0, 0, 0, None)
            )(cam_theta, X, intrinsics, xyc, wc, ())
        )(points, prob.obs_xy, prob.obs_w)
        if robust_delta is None:
            obs_cost = jnp.sum(r_obs ** 2)
        else:
            obs_cost = jnp.sum(_huber_rho(jnp.sum(r_obs ** 2, -1),
                                          robust_delta))
        r_cc = jax.vmap(_center_resid)(cam_theta, prob.cam_prior,
                                       prob.cam_prior_w)
        r_pt = jax.vmap(_pt_prior_resid)(points, prob.pt_prior,
                                         prob.pt_prior_w)
        return 0.5 * (obs_cost + jnp.sum(r_cc ** 2) + jnp.sum(r_pt ** 2))

    return cost_fn


@partial(jax.jit, static_argnames=("free_intr", "max_iters",
                                   "robust_delta"))
def lm_solve(
    prob: BAProblem,
    free_intr: tuple = (),
    max_iters: int = 50,
    lam0: float = 1e-3,
    rtol: float = 1e-8,
    robust_delta: float | None = None,
) -> BAResult:
    """Run LM until convergence/max_iters. One fully-jitted program.

    free_intr: static tuple of indices into the 12-entry intrinsic
    vector to refine per camera (e.g. (0, 1) = fx, fy — Metashape's
    default optimizeCameras(fit_f=True), metashape.py:195-196).
    robust_delta: Huber inlier band in weighted-residual units (sigma);
    None = pure least squares. Outlier observations are IRLS-downweighted
    in every normal-equation build (residuals and Jacobians scaled by
    sqrt(rho')).
    """
    c = prob.cam_theta.shape[0]
    p = prob.points.shape[0]
    ni = len(free_intr)
    b = 6 + ni

    def pack(cam_theta, intr):
        if ni:
            return jnp.concatenate(
                [cam_theta, intr[:, jnp.asarray(free_intr)]], axis=1)
        return cam_theta

    def unpack(theta):
        cam_theta = theta[:, :6]
        intr = prob.intrinsics
        if ni:
            intr = intr.at[:, jnp.asarray(free_intr)].set(theta[:, 6:])
        return cam_theta, intr

    cost_fn = _build_cost(prob, robust_delta)

    jac_obs = jax.jacfwd(_project_resid, argnums=(0, 1))
    jac_cc = jax.jacfwd(_center_resid, argnums=0)

    def resid_theta(theta, X, intr_b, xy, w):
        # residual as a function of the PACKED theta (pose + free intr)
        return _project_resid(theta, X, intr_b, xy, w, free_intr)

    jac_packed = jax.jacfwd(resid_theta, argnums=(0, 1))

    def normal_system(theta, points):
        """Return (S (C*B, C*B), rhs (C*B,), V (P,3,3), W (P,C,B,3),
        g_x (P,3), cost)."""
        cam_theta, intr = unpack(theta)

        def per_point(X, xyc, wc):
            r = jax.vmap(resid_theta, in_axes=(0, None, 0, 0, 0))(
                theta, X, intr, xyc, wc)                     # (C, 2)
            Jt, Jx = jax.vmap(jac_packed, in_axes=(0, None, 0, 0, 0))(
                theta, X, intr, xyc, wc)                     # (C,2,B),(C,2,3)
            return r, Jt, Jx

        r_obs, J_t, J_x = jax.vmap(per_point)(
            points, prob.obs_xy, prob.obs_w)
        if robust_delta is not None:
            rw = _huber_irls_weight(jnp.sum(r_obs ** 2, -1),
                                    robust_delta)      # (P, C)
            r_obs = r_obs * rw[..., None]
            J_t = J_t * rw[..., None, None]
            J_x = J_x * rw[..., None, None]
        # blocks
        U = jnp.einsum("pcib,pcid->cbd", J_t, J_t)           # (C, B, B)
        V = jnp.einsum("pcib,pcid->pbd", J_x, J_x)           # (P, 3, 3)
        W = jnp.einsum("pcib,pcid->pcbd", J_t, J_x)          # (P, C, B, 3)
        g_c = -jnp.einsum("pcib,pci->cb", J_t, r_obs)        # (C, B)
        g_x = -jnp.einsum("pcib,pci->pb", J_x, r_obs)        # (P, 3)

        # camera-center priors
        r_cc = jax.vmap(_center_resid)(cam_theta, prob.cam_prior,
                                       prob.cam_prior_w)
        J_cc = jax.vmap(jac_cc)(cam_theta, prob.cam_prior,
                                prob.cam_prior_w)             # (C, 3, 6)
        if ni:
            J_cc = jnp.concatenate(
                [J_cc, jnp.zeros((c, 3, ni), J_cc.dtype)], axis=2)
        U = U + jnp.einsum("cib,cid->cbd", J_cc, J_cc)
        g_c = g_c - jnp.einsum("cib,ci->cb", J_cc, r_cc)

        # point priors (jacobian = w * I)
        pw2 = prob.pt_prior_w[:, None] ** 2
        V = V + pw2[..., None] * jnp.eye(3)[None]
        r_pt = jax.vmap(_pt_prior_resid)(points, prob.pt_prior,
                                         prob.pt_prior_w)
        g_x = g_x - prob.pt_prior_w[:, None] * r_pt

        return U, V, W, g_c, g_x

    def lm_step(theta, points, lam, cost):
        # `cost` (the objective at theta/points) rides the loop state —
        # no re-evaluation here
        U, V, W, g_c, g_x = normal_system(theta, points)
        # Marquardt (scale-invariant) damping: pose params are radians/
        # meters while intrinsics are ~1e3 px, so additive damping would
        # over-damp one or the other
        dU = jnp.diagonal(U, axis1=1, axis2=2)
        U = U + lam * (dU + 1e-6)[:, :, None] * jnp.eye(b)[None]
        dV = jnp.diagonal(V, axis1=1, axis2=2)
        V = V + lam * (dV + 1e-6)[:, :, None] * jnp.eye(3)[None]

        Vinv = jnp.linalg.inv(V)                              # (P, 3, 3)
        Y = jnp.einsum("pcbj,pjk->pcbk", W, Vinv)             # (P, C, B, 3)
        S_red = jnp.einsum("pcbk,pdek->cdbe", Y, W)           # (C, C, B, B)
        S = -S_red
        S = S.at[jnp.arange(c), jnp.arange(c)].add(U)
        rhs = g_c - jnp.einsum("pcbk,pk->cb", Y, g_x)         # (C, B)

        Sd = S.transpose(0, 2, 1, 3).reshape(c * b, c * b)

        # freeze fixed cameras' POSE params only (their free intrinsics
        # stay adjustable): identity rows/cols + zero rhs, param-wise
        pose_fixed = jnp.broadcast_to(prob.cam_fixed[:, None], (c, 6))
        if ni:
            pose_fixed = jnp.concatenate(
                [pose_fixed, jnp.zeros((c, ni), bool)], axis=1)
        freef = 1.0 - pose_fixed.reshape(-1).astype(Sd.dtype)  # (C*B,)
        Sd = Sd * freef[:, None] * freef[None, :] + jnp.diag(1.0 - freef)
        rhs_flat = rhs.reshape(-1) * freef
        d_theta = jnp.linalg.solve(Sd, rhs_flat).reshape(c, b)
        d_x = jnp.einsum("pjk,pk->pj", Vinv,
                         g_x - jnp.einsum("pcbj,cb->pj", W, d_theta))

        new_theta = theta + d_theta
        new_points = points + d_x
        cam_new, intr_new = unpack(new_theta)
        new_cost = cost_fn(cam_new, intr_new, new_points)
        return new_theta, new_points, cost, new_cost

    theta0 = pack(prob.cam_theta, prob.intrinsics)
    cost0 = cost_fn(prob.cam_theta, prob.intrinsics, prob.points)

    def cond(state):
        _, _, lam, cost, prev_cost, it, done = state
        return (~done) & (it < max_iters)

    def body(state):
        theta, points, lam, cost, _, it, _ = state
        new_theta, new_points, cur_cost, new_cost = lm_step(
            theta, points, lam, cost)
        accept = new_cost < cur_cost
        theta = jnp.where(accept, new_theta, theta)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), lam * 4.0)
        cost_next = jnp.where(accept, new_cost, cur_cost)
        converged = accept & (jnp.abs(cur_cost - new_cost)
                              <= rtol * jnp.maximum(cur_cost, 1e-12))
        diverged = lam > 1e10
        return (theta, points, lam, cost_next, cur_cost, it + 1,
                converged | diverged)

    state = (theta0, prob.points, jnp.asarray(lam0, jnp.float32), cost0,
             cost0 + 1.0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    theta, points, lam, cost, _, it, _ = jax.lax.while_loop(
        cond, body, state)
    cam_theta, intr = unpack(theta)
    return BAResult(cam_theta=cam_theta, intrinsics=intr, points=points,
                    cost=cost, initial_cost=cost0, iterations=it, lam=lam)


def lm_solve_batched(
    probs: BAProblem,
    free_intr: tuple = (),
    max_iters: int = 50,
    lam0: float = 1e-3,
    rtol: float = 1e-8,
    robust_delta: float | None = None,
) -> BAResult:
    """Solve a BATCH of bundle adjustments in one program.

    `probs` is a BAProblem whose every leaf carries a leading batch dim
    (stack per-epoch problems with jax.tree.map) — the whole season's
    BAs run as one vmapped LM program, sharding over a mesh data axis
    like any other batch. Epochs must share P and C (pad observations
    with zero weights).
    """
    fn = partial(lm_solve, free_intr=free_intr, max_iters=max_iters,
                 lam0=lam0, rtol=rtol, robust_delta=robust_delta)
    return jax.vmap(fn)(probs)


@partial(jax.jit, static_argnames=("free_intr", "robust_delta"))
def point_covariances(
    prob: BAProblem,
    cam_theta: Array,
    intrinsics: Array,
    points: Array,
    free_intr: tuple = (),
    robust_delta: float | None = None,
) -> Array:
    """Marginal 3x3 covariance of every point at the BA solution.

    Replaces Metashape's tiepoint_covariance export
    (metashape/metashape_core.py:187-224). Residuals are pre-whitened by
    the 1/sigma weights, so JtJ is the information matrix in physical
    units and Cov_X = V^-1 + V^-1 Wt S^-1 W V^-1 (the camera-uncertainty
    back-substitution; fixed cameras contribute zero).
    Returns (P, 3, 3).
    """
    c = cam_theta.shape[0]
    ni = len(free_intr)
    b = 6 + ni
    theta = cam_theta
    if ni:
        theta = jnp.concatenate(
            [cam_theta, intrinsics[:, jnp.asarray(free_intr)]], axis=1)

    def resid_theta(th, X, intr_b, xy, w):
        return _project_resid(th, X, intr_b, xy, w, free_intr)

    obs_w = prob.obs_w
    if robust_delta is not None:
        # the estimator downweighted outliers via IRLS — the covariance
        # must use the SAME weights, else outlier observations feed full
        # (overconfident) information into JtJ
        r_obs = jax.vmap(
            lambda X, xyc, wc: jax.vmap(
                resid_theta, in_axes=(0, None, 0, 0, 0))(
                    theta, X, intrinsics, xyc, wc)
        )(points, prob.obs_xy, prob.obs_w)
        rw = _huber_irls_weight(jnp.sum(r_obs ** 2, -1), robust_delta)
        obs_w = obs_w * rw

    jac = jax.jacfwd(resid_theta, argnums=(0, 1))

    def per_point(X, xyc, wc):
        Jt, Jx = jax.vmap(jac, in_axes=(0, None, 0, 0, 0))(
            theta, X, intrinsics, xyc, wc)
        return Jt, Jx

    J_t, J_x = jax.vmap(per_point)(points, prob.obs_xy, obs_w)
    U = jnp.einsum("pcib,pcid->cbd", J_t, J_t)
    V = jnp.einsum("pcib,pcid->pbd", J_x, J_x)
    W = jnp.einsum("pcib,pcid->pcbd", J_t, J_x)

    jac_cc = jax.jacfwd(_center_resid, argnums=0)
    J_cc = jax.vmap(jac_cc)(cam_theta, prob.cam_prior, prob.cam_prior_w)
    if ni:
        J_cc = jnp.concatenate(
            [J_cc, jnp.zeros((c, 3, ni), J_cc.dtype)], axis=2)
    U = U + jnp.einsum("cib,cid->cbd", J_cc, J_cc)
    V = V + (prob.pt_prior_w[:, None] ** 2)[..., None] * jnp.eye(3)[None]
    V = V + 1e-8 * jnp.eye(3)[None]

    Vinv = jnp.linalg.inv(V)
    Y = jnp.einsum("pcbj,pjk->pcbk", W, Vinv)
    S = -jnp.einsum("pcbk,pdek->cdbe", Y, W)
    S = S.at[jnp.arange(c), jnp.arange(c)].add(U)
    Sd = S.transpose(0, 2, 1, 3).reshape(c * b, c * b)

    pose_fixed = jnp.broadcast_to(prob.cam_fixed[:, None], (c, 6))
    if ni:
        pose_fixed = jnp.concatenate(
            [pose_fixed, jnp.zeros((c, ni), bool)], axis=1)
    freef = 1.0 - pose_fixed.reshape(-1).astype(Sd.dtype)
    Sd = Sd * freef[:, None] * freef[None, :] + jnp.diag(1.0 - freef)
    cov_theta = jnp.linalg.inv(Sd) * freef[:, None] * freef[None, :]

    # G[p] = W_p^T with shape (3, C*B); note S/cov_theta use the
    # (cam-major, param-minor) flattening [c*b + i]
    G = W.transpose(0, 3, 1, 2).reshape(-1, 3, c * b)
    A = jnp.einsum("pij,pjk->pik", Vinv, G)              # V^-1 Wt (P,3,CB)
    corr = jnp.einsum("pik,kl,pjl->pij", A, cov_theta, A)
    return Vinv + corr
