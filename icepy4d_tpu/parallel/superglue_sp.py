"""Sequence-parallel SuperGlue: token-sharded GNN + rows-sharded Sinkhorn.

Companion to parallel/lightglue_sp.py for the Sinkhorn matcher: both
token sets live sharded over a mesh axis; the attentional GNN runs with
ring attention, and the optimal-transport solve is ROWS-SHARDED — each
device holds its (m_local, N+1) slice of the coupling matrix
(memory O(N^2 / S)), the u-update is purely local, and the v-update
combines per-device column log-sum-exps with a log-space all-reduce.
The dustbin row is one row, so every device computes it redundantly.

    sp_sg = make_sequence_parallel_superglue(mesh, sg, axis="seq")
    out = sp_sg(params, data)   # same data dict as SuperGlue.match
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icepy4d_tpu.models.superglue import (NEG, _attn_propagation, _linear,
                                          keypoint_encoder,
                                          normalize_keypoints)
from icepy4d_tpu.parallel.ring_attention import _ring_attention_local

Array = jax.Array


def _allreduce_lse(partial_lse: Array, axis: str) -> Array:
    """Combine per-shard log-sum-exps into the global one."""
    g = jax.lax.pmax(partial_lse, axis)
    return g + jnp.log(jax.lax.psum(
        jnp.exp(partial_lse - g), axis) + 1e-30)


def make_sequence_parallel_superglue(mesh: Mesh, sg, axis: str = "seq"):
    """Token-sharded SuperGlue forward over `mesh`'s `axis`.

    Same data dict as SuperGlue.match; token dims divisible by the axis
    size. Returns matches0/1 + mscores0/1 with GLOBAL indices (the full
    log_assignment is only ever materialized rows-sharded).
    """
    nh = sg.num_heads
    iters = sg.sinkhorn_iterations
    th = sg.match_threshold
    dd = float(sg.descriptor_dim)

    def local_fn(params, kpts0, desc0, scores0, mask0, size0,
                 kpts1, desc1, scores1, mask1, size1):
        n_shards = jax.lax.psum(1, axis)
        my_shard = jax.lax.axis_index(axis)
        attn = partial(_ring_attention_local, axis_name=axis)
        b, m_loc = mask0.shape
        n_loc = mask1.shape[1]

        kn0 = normalize_keypoints(kpts0, size0)
        kn1 = normalize_keypoints(kpts1, size1)
        d0 = desc0 + keypoint_encoder(params["kenc"], kn0, scores0)
        d1 = desc1 + keypoint_encoder(params["kenc"], kn1, scores1)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["gnn"])
        paired = jax.tree.map(
            lambda a: a.reshape((sg.gnn_layers // 2, 2) + a.shape[1:]),
            stacked)

        def body(carry, pair):
            c0, c1 = carry
            sl = jax.tree.map(lambda a: a[0], pair)
            c0 = c0 + _attn_propagation(sl, c0, c0, mask0, nh, attn=attn)
            c1 = c1 + _attn_propagation(sl, c1, c1, mask1, nh, attn=attn)
            cl = jax.tree.map(lambda a: a[1], pair)
            delta0 = _attn_propagation(cl, c0, c1, mask1, nh, attn=attn)
            delta1 = _attn_propagation(cl, c1, c0, mask0, nh, attn=attn)
            return (c0 + delta0, c1 + delta1), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), paired)

        md0 = _linear(params["final_proj"], d0)
        md1 = _linear(params["final_proj"], d1)
        alpha = jnp.asarray(params["bin_score"], md0.dtype)

        # gather side-1 tokens (O(N) data): rows stay sharded
        g_md1 = jnp.moveaxis(jax.lax.all_gather(md1, axis), 0, 1
                             ).reshape(b, -1, md1.shape[-1])
        g_mask1 = jnp.moveaxis(jax.lax.all_gather(mask1, axis), 0, 1
                               ).reshape(b, -1)
        n = g_mask1.shape[1]

        sim = jnp.einsum("bmd,bnd->bmn", md0, g_md1,
                         preferred_element_type=jnp.float32) / dd ** 0.5
        pair_valid = mask0[:, :, None] & g_mask1[:, None, :]
        sim = jnp.where(pair_valid, sim, NEG)

        # rows-sharded couplings: local rows = [sim | bin0]; the dustbin
        # row [bin1 | alpha] is computed redundantly on every device
        bins0 = jnp.where(mask0, alpha, NEG)[:, :, None]
        Z = jnp.concatenate([sim, bins0], -1)          # (B, m_loc, N+1)
        dust = jnp.concatenate([
            jnp.where(g_mask1, alpha, NEG),
            jnp.full((b, 1), alpha, sim.dtype)], -1)   # (B, N+1)

        ms = jax.lax.psum(jnp.sum(mask0, -1), axis).astype(sim.dtype)
        ns = jax.lax.psum(jnp.sum(mask1, -1), axis).astype(sim.dtype)
        norm = -jnp.log(ms + ns)                        # (B,)
        log_mu = jnp.where(mask0, norm[:, None], NEG)   # local rows
        log_mu_dust = jnp.log(ns) + norm                # dustbin row
        log_nu = jnp.concatenate([
            jnp.where(g_mask1, norm[:, None], NEG),
            (jnp.log(ms) + norm)[:, None]], -1)         # (B, N+1)

        def sink(carry, _):
            u, u_dust, v = carry
            # u: local rows only
            u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
            u_dust = log_mu_dust - jax.nn.logsumexp(dust + v, axis=1)
            # v: distributed column LSE over all rows + the dustbin row
            part = jax.nn.logsumexp(Z + u[:, :, None], axis=1)
            col_lse = _allreduce_lse(part, axis)
            col_lse = jnp.logaddexp(col_lse, dust + u_dust[:, None])
            v = log_nu - col_lse
            return (u, u_dust, v), None

        u0 = jnp.zeros((b, m_loc), sim.dtype)
        v0 = jnp.zeros((b, n + 1), sim.dtype)
        (u, u_dust, v), _ = jax.lax.scan(
            sink, (u0, jnp.zeros((b,), sim.dtype), v0), None,
            length=iters)

        scores = Z + u[:, :, None] + v[:, None, :] - norm[:, None, None]
        block = scores[:, :, :n]                        # (B, m_loc, N)

        # matches0: local-row argmax over global columns
        m0 = jnp.argmax(block, axis=2)
        max0 = jnp.max(block, axis=2)
        ms0 = jnp.exp(max0)

        # matches1: distributed column argmax
        my_index0 = my_shard * m_loc + jnp.arange(m_loc)[None]
        cmax = jnp.max(block, axis=1)                   # (B, N)
        carg = my_shard * m_loc + jnp.argmax(block, axis=1)
        g_cmax = jax.lax.all_gather(cmax, axis)         # (S, B, N)
        g_carg = jax.lax.all_gather(carg, axis)
        best_s = jnp.argmax(g_cmax, axis=0)             # (B, N)
        m1_full = jnp.take_along_axis(
            jnp.moveaxis(g_carg, 0, 2), best_s[..., None], 2)[..., 0]
        m1 = jax.lax.dynamic_slice_in_dim(
            m1_full, my_shard * n_loc, n_loc, axis=1)

        # dense semantics (filter_matches): scores mutual-gated
        # PRE-threshold; only the match indices apply the filter
        back = jnp.take_along_axis(m1_full, jnp.maximum(m0, 0), 1)
        mutual0 = mask0 & (back == my_index0)
        mscores0 = jnp.where(mutual0, ms0, 0.0)
        valid0 = mutual0 & (ms0 > th)
        matches0 = jnp.where(valid0, m0, -1).astype(jnp.int32)

        # side1: mutual means the row it points to points back
        g_m0 = jnp.moveaxis(jax.lax.all_gather(m0, axis), 0, 1
                            ).reshape(b, -1)             # (B, M) global
        g_v0 = jnp.moveaxis(jax.lax.all_gather(valid0, axis), 0, 1
                            ).reshape(b, -1)
        g_s0 = jnp.moveaxis(jax.lax.all_gather(mscores0, axis), 0, 1
                            ).reshape(b, -1)
        my_index1 = my_shard * n_loc + jnp.arange(n_loc)[None]
        back1 = jnp.take_along_axis(g_m0, jnp.maximum(m1, 0), 1)
        mutual1 = mask1 & (back1 == my_index1)
        ms1 = jnp.take_along_axis(g_s0, jnp.maximum(m1, 0), 1)
        mscores1 = jnp.where(mutual1, ms1, 0.0)
        valid1 = mutual1 & jnp.take_along_axis(
            g_v0, jnp.maximum(m1, 0), 1)
        matches1 = jnp.where(valid1, m1, -1).astype(jnp.int32)
        return matches0, matches1, mscores0, mscores1

    tok = P(None, axis)
    tok3 = P(None, axis, None)
    rep = P(None, None)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), tok3, tok3, tok, tok, rep,
                  tok3, tok3, tok, tok, rep),
        out_specs=(tok, tok, tok, tok),
        check_vma=False,
    )

    @jax.jit
    def run(params, data):
        with jax.default_matmul_precision(sg.precision):
            return _run_inner(params, data)

    def _run_inner(params, data):
        m0, m1, s0, s1 = fn(
            params, data["kpts0"], data["desc0"], data["scores0"],
            data["mask0"], data["size0"], data["kpts1"], data["desc1"],
            data["scores1"], data["mask1"], data["size1"])
        return {"matches0": m0, "matches1": m1,
                "mscores0": s0, "mscores1": s1}

    return run
