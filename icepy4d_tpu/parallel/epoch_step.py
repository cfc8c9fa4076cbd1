"""Sharded end-to-end epoch step: extract → match → pose → triangulate.

This is the framework's "training step" equivalent (SURVEY.md §3.1's hot
loop body), expressed as ONE jitted program over a batch of stereo pairs
and sharded over a (data, model) mesh:

  data  — the stereo-pair/epoch batch dim (pure DP, no comm)
  model — descriptor feature dim of the matcher's linears/attention
          (TP via sharding-constraint propagation; XLA inserts the
          all-gathers/psums over ICI)

The reference processes epochs strictly sequentially (main_dev.py:60);
here a whole batch of epochs rides one XLA program across the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icepy4d_tpu.ops.ransac import ransac_essential_pose
from icepy4d_tpu.ops.topk import top2_last
from icepy4d_tpu.ops.triangulation import iterative_ls_triangulation


def _pose_and_triangulate(feats0, feats1, matches0, K0, K1,
                          n_hypotheses: int, threshold_px: float):
    """Shared epoch-step tail: gather matched keypoints, RANSAC an
    essential pose per pair and triangulate (all vmapped over the
    pair batch — fixed capacity, masked)."""
    m0 = matches0                              # (B, K)
    valid = m0 > -1
    j = jnp.maximum(m0, 0)
    mk0 = feats0["keypoints"]                  # (B, K, 2)
    mk1 = jnp.take_along_axis(feats1["keypoints"], j[..., None], axis=1)

    def pose_and_points(key, x0, x1, vmask):
        R, t, E, inl = ransac_essential_pose(
            key, x0, x1, K0, K1, vmask,
            threshold_px=threshold_px, n_hypotheses=n_hypotheses)
        P0 = K0 @ jnp.eye(3, 4)
        P1 = K1 @ jnp.concatenate([R, t[:, None]], axis=1)
        pts, _ = iterative_ls_triangulation(x0, x1, P0, P1)
        return R, t, pts, inl

    b = m0.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    R, t, pts, inl = jax.vmap(pose_and_points)(keys, mk0, mk1, valid)
    return {
        "matches0": m0,
        "mkpts0": mk0,
        "mkpts1": mk1,
        "valid": valid & inl,
        "R": R,
        "t": t,
        "points3d": pts,
    }


def make_sharded_match_step(
    mesh: Mesh,
    superpoint,
    matcher,
    n_hypotheses: int = 128,
    threshold_px: float = 2.0,
):
    """Build a pjit-ted step fn over `mesh`.

    step(sp_params, m_params, images0, images1, K0, K1) with
      images* (B, H, W) grayscale [0,1], B divisible by the data axis;
      K* (3, 3) shared intrinsics.
    Returns dict with per-pair matches, relative pose and triangulated
    points (fixed capacity = matcher keypoint capacity, masked).
    """
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def step(sp_params, m_params, images0, images1, K0, K1):
        b, h, w = images0.shape
        feats0 = superpoint.extract(sp_params, images0)
        feats1 = superpoint.extract(sp_params, images1)

        # TP hint: shard the descriptor feature dim over `model`; XLA
        # propagates this through the matcher's linears and attention.
        tp = NamedSharding(mesh, P("data", None, "model"))
        d0 = jax.lax.with_sharding_constraint(feats0["descriptors"], tp)
        d1 = jax.lax.with_sharding_constraint(feats1["descriptors"], tp)

        size = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (b, 2))
        data = {
            "kpts0": feats0["keypoints"], "desc0": d0,
            "mask0": feats0["mask"], "size0": size,
            "kpts1": feats1["keypoints"], "desc1": d1,
            "mask1": feats1["mask"], "size1": size,
            "scores0": feats0["scores"], "scores1": feats1["scores"],
        }
        out = matcher.match(m_params, data)
        res = _pose_and_triangulate(feats0, feats1, out["matches0"],
                                    K0, K1, n_hypotheses, threshold_px)
        res["mscores0"] = out["mscores0"]
        return res

    return jax.jit(
        step,
        in_shardings=(rep, rep, dp, dp, rep, rep),
        out_shardings=dp,
    )


def _nn_epipolar_band(d0, d1, k0, k1, mask0, mask1, F, band,
                      ratio, min_sim):
    """Epipolar-guided Lowe-ratio NN with a PER-PAIR fundamental matrix
    F (B, 3, 3) — the batched in-program equivalent of
    `SIFTMatcher._nn_epipolar` (matchers.py), which takes one shared F.
    Candidates outside `band` px of each other's epipolar lines are
    masked out of the similarity matrix BEFORE the ratio test."""
    h0 = jnp.concatenate([k0, jnp.ones_like(k0[..., :1])], -1)
    h1 = jnp.concatenate([k1, jnp.ones_like(k1[..., :1])], -1)
    l1 = jnp.einsum("brc,bmc->bmr", F, h0)        # lines in im1 per kpt0
    l0 = jnp.einsum("bcr,bnc->bnr", F, h1)        # lines in im0 per kpt1
    num = jnp.einsum("bmr,bnr->bmn", l1, h1)      # h1_n . l1_m
    d_1 = jnp.abs(num) / jnp.maximum(jnp.linalg.norm(
        l1[..., :2], axis=-1)[:, :, None], 1e-9)
    d_0 = jnp.abs(num) / jnp.maximum(jnp.linalg.norm(
        l0[..., :2], axis=-1)[:, None, :], 1e-9)
    inband = (d_1 < band) & (d_0 < band)

    sim = jnp.einsum("bmd,bnd->bmn", d0, d1,
                     preferred_element_type=jnp.float32)
    neg = jnp.finfo(sim.dtype).min
    sim = jnp.where(mask0[:, :, None] & mask1[:, None, :] & inband,
                    sim, neg)
    s1, s2, m0 = top2_last(sim)
    r2 = ratio ** 2
    ok = (1.0 - s1) < r2 * (1.0 - s2)
    ok |= (s2 <= neg / 2)             # lone in-band candidate passes
    m1 = jnp.argmax(sim, axis=1)
    inds = jnp.arange(sim.shape[1])[None]
    ok &= inds == jnp.take_along_axis(m1, m0, 1)
    ok &= mask0 & (s1 > min_sim)
    return (jnp.where(ok, m0, -1).astype(jnp.int32),
            jnp.where(ok, s1, 0.0))


def make_sharded_nn_step(
    mesh: Mesh,
    extractor,
    nn_fn,
    n_hypotheses: int = 128,
    threshold_px: float = 2.0,
    guided: dict | None = None,
):
    """Sharded season step for the CLASSIC matcher family (SIFT /
    NN-over-SuperPoint): extraction + mutual/Lowe-ratio NN matching +
    epipolar-guided rematch + RANSAC pose + triangulation as ONE
    pjit-ted program, data axis = epochs. This is the mesh-parallel
    path for the parameter-free SIFT production chain (the matcher that
    yields real geometry without pretrained weights) — the reference
    has no counterpart (its epoch loop is strictly sequential,
    main_dev.py:60).

    step(sp_params, m_params, images0, images1, K0, K1[, F_prior,
    prior_ok]): first six args identical to make_sharded_match_step so
    `Pipeline.run_batched` treats both families uniformly (m_params is
    ignored — classic matchers are parameter-free).

    `nn_fn(d0, d1, mask0, mask1) -> (matches0, mscores0)` is the
    batched NN kernel — e.g. the bound `SIFTMatcher._nn` (Lowe ratio on
    unit-descriptor Euclidean distances) or `NearestNeighborMatcher._nn`
    (mutual cosine). Classic descriptors have no feature-dim tensor
    parallelism worth sharding; the mesh's model axis stays idle here
    and scaling is pure DP over epochs.

    `guided` (dict: band, ratio, min_sim) enables the production
    two-stage match inside the SAME program: blind NN -> per-pair F
    (surveyed prior where `prior_ok`, else from the stage-1 essential
    RANSAC) -> strict NN restricted to the epipolar band. On the real
    wide-baseline season the blind stage is a 1-2%-inlier problem; the
    guided round is what recovers production-grade counts
    (ROADMAP: 21 -> ~900 on the real pair). With guidance on, the step
    takes F_prior (B, 3, 3) in the MATCH pixel frame and prior_ok (B,)
    flags (pass zeros/False to guide purely from stage 1).
    """
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def _blind(feats0, feats1):
        return nn_fn(feats0["descriptors"], feats1["descriptors"],
                     feats0["mask"], feats1["mask"])

    def step(sp_params, m_params, images0, images1, K0, K1,
             F_prior=None, prior_ok=None):
        del m_params
        feats0 = extractor.extract(sp_params, images0)
        feats1 = extractor.extract(sp_params, images1)
        matches0, mscores0 = _blind(feats0, feats1)

        if guided is not None:
            valid = matches0 > -1
            j = jnp.maximum(matches0, 0)
            mk0 = feats0["keypoints"]
            mk1 = jnp.take_along_axis(
                feats1["keypoints"], j[..., None], axis=1)

            def stage1_F(key, x0, x1, v):
                _R, _t, E, _inl = ransac_essential_pose(
                    key, x0, x1, K0, K1, v,
                    threshold_px=threshold_px,
                    n_hypotheses=n_hypotheses)
                return jnp.linalg.inv(K1).T @ E @ jnp.linalg.inv(K0)

            b = matches0.shape[0]
            keys = jax.random.split(jax.random.PRNGKey(1), b)
            F_est = jax.vmap(stage1_F)(keys, mk0, mk1, valid)
            if F_prior is not None and prior_ok is not None:
                F = jnp.where(prior_ok[:, None, None], F_prior, F_est)
            else:
                F = F_est
            matches0, mscores0 = _nn_epipolar_band(
                feats0["descriptors"], feats1["descriptors"],
                feats0["keypoints"], feats1["keypoints"],
                feats0["mask"], feats1["mask"], F,
                jnp.float32(guided["band"]),
                float(guided["ratio"]), float(guided["min_sim"]))

        res = _pose_and_triangulate(feats0, feats1, matches0,
                                    K0, K1, n_hypotheses, threshold_px)
        res["mscores0"] = mscores0
        return res

    if guided is None:
        return jax.jit(
            step,
            in_shardings=(rep, rep, dp, dp, rep, rep),
            out_shardings=dp,
        )
    return jax.jit(
        step,
        in_shardings=(rep, rep, dp, dp, rep, rep, dp, dp),
        out_shardings=dp,
    )
