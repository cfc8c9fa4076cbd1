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
    key: Array, mask: Array, n_hypotheses: int, sample_size: int,
    guidance: Array | None = None,
) -> Array:
    """(H, S) index sets drawn from valid rows, without replacement.

    Gumbel-top-k trick: add iid Gumbel noise to log-mask and take the
    top-S per hypothesis — fully batched, no per-hypothesis permutation.

    `guidance` (N,) are match-quality scores (higher = better). When
    given, sampling is PROSAC-style quality-guided: rows are weighted
    exp(-rank / tau) with tau ~ 2% of the valid count, so minimal
    samples concentrate on the most confident correspondences (with a
    soft tail) instead of uniform draws. This is what makes 1-2%%
    inlier regimes (wide-baseline SIFT at a permissive Lowe ratio)
    solvable with a static hypothesis budget: the top of the quality
    ranking is ~30-60%% inliers even when the full set is ~2%%.
    """
    n = mask.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    if guidance is not None:
        w = rank_weights(mask, guidance)
        logits = logits + jnp.log(jnp.maximum(w, 1e-30))
    g = jax.random.gumbel(key, (n_hypotheses, n))
    _, idx = jax.lax.top_k(logits[None, :] + g, sample_size)
    return idx


def rank_weights(mask: Array, guidance: Array) -> Array:
    """exp(-rank / tau) quality weights, tau ~ 2% of the valid count.

    Used both to bias minimal-sample draws (PROSAC) and to score
    consensus sets: with ~100 true inliers in ~6000 putatives, a bogus
    model catches as many CHANCE inliers as the true model catches real
    ones — raw counts tie. True inliers concentrate at the top of the
    quality ranking (top-2%% is 30-60%% inliers), chance inliers are
    rank-uniform, so the weighted sums differ by an order of magnitude.
    """
    n = mask.shape[0]
    order = jnp.argsort(jnp.where(mask, -guidance, jnp.inf))
    rank = jnp.zeros((n,), jnp.float32).at[order].set(
        jnp.arange(n, dtype=jnp.float32))
    tau = jnp.maximum(32.0, 0.02 * jnp.sum(mask))
    return jnp.exp(-rank / tau) * mask


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
    guidance: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Generic engine: returns (best_model, inlier_mask, n_inliers).

    solver(weights (N,)) -> model pytree for a weighted minimal set;
    residual(model) -> (N,) squared residuals in threshold units.
    """
    n = mask.shape[0]
    idx = sample_minimal_sets(key, mask, n_hypotheses, sample_size,
                              guidance)
    weights = jax.vmap(_one_hot_weights, in_axes=(0, None))(idx, n)  # (H, N)
    models = jax.vmap(solver)(weights)  # pytree with leading H
    res = jax.vmap(residual)(models)  # (H, N)
    inl = (res < threshold**2) & mask[None, :]
    if guidance is not None:
        # blended consensus (see rank_weights): pure counts cannot
        # separate true from chance support in low-inlier-rate regimes,
        # pure quality mass rewards tiny top-ranked sets — the 0.1/row
        # count term breaks both failure modes
        w = 0.1 + rank_weights(mask, guidance)
        scores = jnp.sum(jnp.where(inl, w[None, :], 0.0), axis=1)
    else:
        scores = jnp.sum(inl.astype(jnp.int32), axis=1).astype(jnp.float32)
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
    guidance: Array | None = None,
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
        guidance=guidance,
    )

    # refit weights: with guidance the hard-threshold consensus still
    # contains rank-uniform CHANCE inliers — quality-weight the refit so
    # they cannot drag the model (floor 0.1 keeps deep-rank true
    # inliers contributing). Refits are candidates accepted by hard
    # inlier count (a weighted refit may shrink to the weight mass).
    rw = (None if guidance is None
          else 0.1 + rank_weights(mask, guidance))

    sel_w = (jnp.ones_like(mask, jnp.float32) if rw is None else rw)
    cand_F, cand_inl = [F], [inliers]
    Fc, inlc = F, inliers
    for _ in range(max(refit_iters, 1)):
        w = inlc.astype(jnp.float32) if rw is None else inlc * rw
        Fc = epipolar.eight_point(x0, x1, w)
        d = epipolar.sampson_distance(Fc, x0, x1)
        inlc = (d < threshold**2) & mask
        cand_F.append(Fc)
        cand_inl.append(inlc)
    scores_c = jnp.stack(
        [jnp.sum(jnp.where(i, sel_w, 0.0)) for i in cand_inl])
    bi = jnp.argmax(scores_c + 1e-3 * jnp.arange(len(cand_inl)))
    return jnp.stack(cand_F)[bi], jnp.stack(cand_inl)[bi]


# ---------------------------------------------------------------------------
# Homography — hypothesis solver for the DEGENSAC plane check
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_homography(
    key: Array,
    x0: Array,
    x1: Array,
    mask: Array,
    threshold: float = 3.0,
    n_hypotheses: int = 256,
) -> tuple[Array, Array]:
    """Homography RANSAC (4-point DLT, symmetric transfer error).

    Returns (H (3, 3), inlier mask (N,)).
    """
    solver = lambda w: epipolar.homography_dlt(x0, x1, w)
    residual = lambda H: epipolar.homography_sym_transfer(H, x0, x1)
    H, inliers, _ = ransac(
        key, solver, residual, mask,
        sample_size=4, n_hypotheses=n_hypotheses, threshold=threshold,
    )
    H = epipolar.homography_dlt(x0, x1, inliers.astype(jnp.float32))
    d = epipolar.homography_sym_transfer(H, x0, x1)
    inliers = (d < threshold**2) & mask
    return H, inliers


# ---------------------------------------------------------------------------
# DEGENSAC-style F estimation — plane-degeneracy detection + recovery
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("n_hypotheses", "h_hypotheses", "refit_iters"))
def ransac_fundamental_degensac(
    key: Array,
    x0: Array,
    x1: Array,
    mask: Array,
    threshold: float = 1.5,
    n_hypotheses: int = 512,
    h_hypotheses: int = 256,
    degeneracy_frac: float = 0.8,
    refit_iters: int = 2,
    guidance: Array | None = None,
) -> tuple[Array, Array, Array]:
    """F-matrix RANSAC with DEGENSAC plane-degeneracy handling.

    The reference's primary GV is pydegensac with an H-degeneracy test
    (matching/geometric_verification.py:64-79): on dominant-plane scenes
    (exactly the glacier-face case) plain F-RANSAC returns a model that
    only encodes the plane homography. Here:

      1. plain hypothesis-parallel F-RANSAC (ransac_fundamental);
      2. H-RANSAC restricted to F's consensus set; if H explains
         > degeneracy_frac of it, the configuration is degenerate;
      3. plane-and-parallax recovery: F' = [e']_x H with the epipole
         estimated from the OFF-plane correspondences
         (epipolar.fundamental_from_homography), refit on its inliers;
      4. keep whichever of {F, F'} has the larger consensus set.

    Returns (F (3, 3), inlier mask (N,), degenerate flag ()).
    """
    kF, kH = jax.random.split(key)
    F, inlF = ransac_fundamental(
        kF, x0, x1, mask, threshold, n_hypotheses, refit_iters,
        guidance=guidance)
    nF = jnp.sum(inlF)

    # Symmetric transfer error sums FOUR noisy coordinates (two points,
    # both directions) vs Sampson's one point-line distance: at noise
    # sigma the expectations are ~8 sigma^2 vs ~2 sigma^2, so the
    # H-inlier threshold must be ~2x the F threshold plus headroom —
    # too tight and noisy plane points leak into the "off-plane" set.
    H, inlH = ransac_homography(
        kH, x0, x1, inlF,
        threshold=threshold * 3.0, n_hypotheses=h_hypotheses)
    degenerate = jnp.sum(inlH) > degeneracy_frac * jnp.maximum(nF, 1)

    # Plane-and-parallax recovery. The off-plane set (mask & ~inlH)
    # also contains the gross putative-match OUTLIERS, so the epipole is
    # found by RANSAC over 2-line minimal samples (each off-plane
    # correspondence gives a line (H x0) x x1 through e'; two lines
    # intersect in a candidate epipole; score F = [e']_x H by Sampson on
    # the off-plane set) — the same resampling robustness pydegensac
    # gets from re-running its inner loop on non-degenerate samples.
    # Only points with REAL parallax constrain the epipole: noisy
    # near-plane points (small |Hx0 - x1|) fit any [e']_x H and would
    # flood both the minimal samples and the consensus scores. Scores
    # are parallax-WEIGHTED (capped, so a gross mismatch that happens to
    # fit a hypothesis cannot dominate): genuinely off-plane points
    # carry the decision.
    par2 = epipolar.parallax_sq(H, x0, x1)
    off_b = mask & ~inlH & (par2 > (3.0 * threshold) ** 2)
    w_par = jnp.where(off_b, jnp.clip(jnp.sqrt(par2), 0.0, 50.0), 0.0)
    kE = jax.random.fold_in(kH, 1)

    def pp_solver(w):
        e1 = epipolar.epipole_from_lines(H, x0, x1, w)
        Fc = epipolar.skew(e1) @ H
        return Fc / jnp.maximum(jnp.abs(Fc).max(), 1e-12)

    idxE = sample_minimal_sets(kE, off_b, h_hypotheses, 2)
    wE = jax.vmap(_one_hot_weights, in_axes=(0, None))(
        idxE, mask.shape[0])
    Fs = jax.vmap(pp_solver)(wE)
    resE = jax.vmap(
        lambda Fc: epipolar.sampson_distance(Fc, x0, x1))(Fs)
    scoresE = jnp.sum(
        jnp.where(resE < threshold**2, w_par[None, :], 0.0), axis=1)
    bestE = jnp.argmax(scoresE)
    Fpp = Fs[bestE]
    inl_pp_off = (resE[bestE] < threshold**2) & off_b
    # IRLS polish of the epipole bundle on the RANSAC consensus (clean
    # by construction; saturated parallax weighting inside)
    Fpp2 = epipolar.fundamental_from_homography(
        H, x0, x1, inl_pp_off.astype(jnp.float32))

    def refit(_, carry):
        F, inl = carry
        F = epipolar.eight_point(x0, x1, inl.astype(jnp.float32))
        d = epipolar.sampson_distance(F, x0, x1)
        return F, (d < threshold**2) & mask

    d_pp = epipolar.sampson_distance(Fpp, x0, x1)
    inl_pp = (d_pp < threshold**2) & mask
    d_pp2 = epipolar.sampson_distance(Fpp2, x0, x1)
    inl_pp2 = (d_pp2 < threshold**2) & mask
    # Refit can drag the recovered model back onto the plane (its inlier
    # set is plane-dominated), so keep BOTH the raw plane-and-parallax
    # models and the refit as candidates.
    Fpp_r, inl_pp_r = jax.lax.fori_loop(
        0, refit_iters, refit, (Fpp2, inl_pp2))

    # Model selection on the PARALLAX-bearing off-plane set only
    # (weighted like the epipole search): a degenerate F overfits the
    # plane, so its TOTAL count is inflated — what discriminates the
    # true epipolar geometry is how much genuine off-plane parallax
    # each model explains.
    def n_off(Fc):
        return jnp.sum(jnp.where(
            epipolar.sampson_distance(Fc, x0, x1) < threshold**2,
            w_par, 0.0))

    pp_valid = jnp.sum(off_b) >= 2
    cand_F = jnp.stack([F, Fpp, Fpp2, Fpp_r])
    cand_inl = jnp.stack([inlF, inl_pp, inl_pp2, inl_pp_r])
    scores = jnp.stack([n_off(F), n_off(Fpp), n_off(Fpp2),
                        n_off(Fpp_r)])
    # Plane-and-parallax candidates only count when degenerate & valid;
    # ties go to the plain model (argmax picks the first maximum).
    ok_pp = degenerate & pp_valid
    allow = jnp.stack([jnp.bool_(True), ok_pp, ok_pp, ok_pp])
    best = jnp.argmax(jnp.where(allow, scores, -1))
    return cand_F[best], cand_inl[best], degenerate


# ---------------------------------------------------------------------------
# MAGSAC-style F estimation — sigma-consensus (threshold-marginalized)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_hypotheses", "polish_iters"))
def ransac_fundamental_magsac(
    key: Array,
    x0: Array,
    x1: Array,
    mask: Array,
    sigma_max: float = 2.0,
    n_hypotheses: int = 512,
    polish_iters: int = 3,
    guidance: Array | None = None,
) -> tuple[Array, Array]:
    """F-matrix RANSAC with sigma-consensus scoring (MAGSAC semantics).

    The reference's fallback GV is cv2.USAC_MAGSAC
    (matching/geometric_verification.py:87-95), which marginalizes the
    inlier threshold over noise scales instead of fixing one. Uniformly
    marginalizing a hard threshold over sigma in (0, sigma_max] gives the
    closed-form hypothesis quality

        q(model) = sum_i max(0, 1 - r_i / sigma_max)

    (r_i = Sampson distance in px): a point at r=0 contributes 1, a point
    at r=sigma_max contributes 0 — no single hand-picked threshold. The
    winning model is polished by sigma-weighted least squares
    (MAGSAC++'s iterated weighted refit). The returned mask flags
    r < sigma_max for downstream consumers that need a hard set.
    """
    n = mask.shape[0]
    idx = sample_minimal_sets(key, mask, n_hypotheses, 8, guidance)
    weights = jax.vmap(_one_hot_weights, in_axes=(0, None))(idx, n)
    solver = lambda w: epipolar.eight_point(x0, x1, w)
    models = jax.vmap(solver)(weights)
    res = jax.vmap(lambda F: epipolar.sampson_distance(F, x0, x1))(models)
    r = jnp.sqrt(jnp.maximum(res, 0.0))
    qw = (mask.astype(jnp.float32) if guidance is None
          else (0.1 + rank_weights(mask, guidance)) * mask)
    q = jnp.sum(jnp.maximum(0.0, 1.0 - r / sigma_max) * qw[None, :], 1)
    best = jnp.argmax(q)
    F = models[best]

    def polish(_, F):
        d = jnp.sqrt(jnp.maximum(
            epipolar.sampson_distance(F, x0, x1), 0.0))
        w = jnp.maximum(0.0, 1.0 - d / sigma_max) * qw
        return epipolar.eight_point(x0, x1, w)

    F = jax.lax.fori_loop(0, polish_iters, polish, F)
    d = epipolar.sampson_distance(F, x0, x1)
    inliers = (d < sigma_max**2) & mask
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
    guidance: Array | None = None,
    F_hint: Array | None = None,
) -> tuple[Array, Array, Array, Array]:
    """Essential-matrix RANSAC + cheirality pose recovery.

    Pixel coords in, pose out. The reference normalizes the px threshold
    by the mean focal (sfm/geometry.py:49-52); we score Sampson distance
    in normalized units against the same scaled threshold. Returns
    (R, t, E, inlier_mask): R, t transform cam0-frame points to
    cam1-frame (x1 = R @ x0 + t), t unit-norm.

    `F_hint` (3, 3): a fundamental matrix already verified upstream
    (the matcher's GV output). K1^T F K0 projected onto the essential
    manifold enters the hypothesis pool — on contaminated consensus
    sets (chance inliers of a permissive putative stage) the 8-point
    minimal samples alone are unreliable, while the GV model was
    estimated against the FULL quality-ranked putative set.
    `guidance` (N,) quality-weights sampling, scoring and the refit
    (see rank_weights).
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

    n = mask.shape[0]
    idx = sample_minimal_sets(key, mask, n_hypotheses, 8, guidance)
    weights = jax.vmap(_one_hot_weights, in_axes=(0, None))(idx, n)
    models = jax.vmap(
        lambda w: epipolar.essential_eight_point(x0n, x1n, w))(weights)
    if F_hint is not None:
        # x1^T F x0 = 0 with pixel coords  =>  E ~ K1^T F K0 in
        # normalized coords; project onto the essential manifold
        Eh = K1.T @ F_hint @ K0
        U, _s, Vt = jnp.linalg.svd(Eh)
        Eh = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0])) @ Vt
        models = jnp.concatenate([models, Eh[None]], axis=0)
    res = jax.vmap(
        lambda E: epipolar.sampson_distance(E, x0n, x1n))(models)
    inl_all = (res < th_n ** 2) & mask[None, :]
    qw = (mask.astype(jnp.float32) if guidance is None
          else (0.1 + rank_weights(mask, guidance)) * mask)
    scores = jnp.sum(jnp.where(inl_all, qw[None, :], 0.0), axis=1)
    best = jnp.argmax(scores)
    E = models[best]
    inliers = inl_all[best]

    # weighted refits are CANDIDATES, not replacements. Selection among
    # HYPOTHESES used the quality-weighted score (contamination-robust);
    # refit ACCEPTANCE uses the hard inlier count — a weighted refit
    # that shrinks the consensus to the few top-ranked rows (weight
    # mass without support) must not win.
    rw = (mask.astype(jnp.float32) if guidance is None
          else (0.1 + rank_weights(mask, guidance)))
    cand_E = [E]
    cand_inl = [inliers]
    Ec, inlc = E, inliers
    for _ in range(2):
        Ec = epipolar.essential_eight_point(x0n, x1n, inlc * rw)
        d = epipolar.sampson_distance(Ec, x0n, x1n)
        inlc = (d < th_n ** 2) & mask
        cand_E.append(Ec)
        cand_inl.append(inlc)
    scores_c = jnp.stack(
        [jnp.sum(jnp.where(i, qw, 0.0)) for i in cand_inl])
    # epsilon bonus prefers the (least-squares, lower-noise) refits on
    # score ties
    bi = jnp.argmax(scores_c + 1e-3 * jnp.arange(len(cand_inl)))
    E = jnp.stack(cand_E)[bi]
    inliers = jnp.stack(cand_inl)[bi]
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
