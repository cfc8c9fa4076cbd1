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
from icepy4d_tpu.ops.triangulation import iterative_ls_triangulation


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

        m0 = out["matches0"]                      # (B, K)
        valid = m0 > -1
        j = jnp.maximum(m0, 0)
        mk0 = feats0["keypoints"]                 # (B, K, 2)
        mk1 = jnp.take_along_axis(feats1["keypoints"], j[..., None], axis=1)

        def pose_and_points(key, x0, x1, vmask):
            R, t, E, inl = ransac_essential_pose(
                key, x0, x1, K0, K1, vmask,
                threshold_px=threshold_px, n_hypotheses=n_hypotheses)
            P0 = K0 @ jnp.eye(3, 4)
            P1 = K1 @ jnp.concatenate([R, t[:, None]], axis=1)
            pts, _ = iterative_ls_triangulation(x0, x1, P0, P1)
            return R, t, pts, inl

        keys = jax.random.split(jax.random.PRNGKey(0), b)
        R, t, pts, inl = jax.vmap(pose_and_points)(keys, mk0, mk1, valid)
        return {
            "matches0": m0,
            "mscores0": out["mscores0"],
            "mkpts0": mk0,
            "mkpts1": mk1,
            "valid": valid & inl,
            "R": R,
            "t": t,
            "points3d": pts,
        }

    return jax.jit(
        step,
        in_shardings=(rep, rep, dp, dp, rep, rep),
        out_shardings=dp,
    )
