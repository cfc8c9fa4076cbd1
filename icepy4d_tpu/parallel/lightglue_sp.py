"""Sequence-parallel LightGlue: keypoint tokens sharded over the mesh.

Full-frame matching of very large imagery produces token counts whose
attention/assignment matrices exceed one chip's HBM (SURVEY §2.12's
long-context analogue). Here BOTH token sets live sharded over a mesh
axis and the entire matcher — transformer layers AND match assignment —
runs distributed:

- self/cross attention: ring attention (ppermute'd K/V blocks, online
  softmax; parallel/ring_attention.py)
- the sigmoid-log-double-softmax assignment is never materialized
  globally: row/column log-sum-exps and the mutual-argmax are computed
  with additional ring passes, so per-device memory is
  O(N_local * N_local) instead of O(N^2)
- only O(N) quantities (matches, scores) are gathered at the end

    sp_lg = make_sequence_parallel_lightglue(mesh, lg, axis="seq")
    out = sp_lg(params, data)    # same data/result dict as lg.match
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icepy4d_tpu.models.lightglue import (NEG_INF, _linear, cross_block,
                                          normalize_keypoints,
                                          rotary_encoding, self_block)
from icepy4d_tpu.parallel.ring_attention import _ring_attention_local

Array = jax.Array


def _row_lse_and_argmax(md_q, z_k, mask_q, mask_k, md_k, col_lse,
                        axis: str, n_shards: int, my_shard, n_loc: int):
    """For each LOCAL query row: log-sum-exp of sim over ALL keys, plus
    the argmax (global index) of the assignment-block value
    2*sim - key_lse + log_sigmoid(z_k); masked keys excluded."""

    def body(carry, blocks, i):
        mx, se, bmax, barg = carry
        mdk, zk, mk, clse = blocks
        # ppermute moves blocks forward (s -> s+1): after i steps this
        # device holds the block that STARTED on shard (my_shard - i)
        shard = (my_shard - i) % n_shards
        sim = jnp.einsum("bmd,bnd->bmn", md_q, mdk,
                         preferred_element_type=jnp.float32)
        pair = mask_q[:, :, None] & mk[:, None, :]
        sim = jnp.where(pair, sim, NEG_INF)
        # running logsumexp over keys
        m_new = jnp.maximum(mx, jnp.max(sim, -1))
        se = se * jnp.exp(mx - m_new) + jnp.sum(
            jnp.exp(sim - m_new[..., None]), -1)
        # running argmax of the assignment-block value: block(i,j) =
        # 2*sim - row_lse(i) - key_lse(j) + logsig(z_i) + logsig(z_j);
        # row terms are constant over j, so track the j-dependent part
        val = 2.0 * sim - clse[:, None, :] \
            + jax.nn.log_sigmoid(zk)[:, None, :]
        val = jnp.where(pair, val, -jnp.inf)
        v = jnp.max(val, -1)
        a = jnp.argmax(val, -1) + shard * n_loc
        upd = v > bmax
        bmax = jnp.where(upd, v, bmax)
        barg = jnp.where(upd, a, barg)
        return m_new, se, bmax, barg

    b, m_loc = mask_q.shape
    init = (jnp.full((b, m_loc), -jnp.inf),
            jnp.zeros((b, m_loc)),
            jnp.full((b, m_loc), -jnp.inf),
            jnp.zeros((b, m_loc), jnp.int32))
    blocks = (md_k, z_k, mask_k, col_lse)

    def step(carry, i):
        blocks, acc = carry
        acc = body(acc, blocks, i)
        blocks = jax.tree.map(
            lambda t: jax.lax.ppermute(
                t, axis, [(s, (s + 1) % n_shards) for s in range(n_shards)]),
            blocks)
        return (blocks, acc), None

    (_, (mx, se, bmax, barg)), _ = jax.lax.scan(
        step, (blocks, init), jnp.arange(n_shards))
    lse = mx + jnp.log(jnp.maximum(se, 1e-30))
    return lse, bmax, barg


def _plain_lse(md_q, mask_q, md_k, mask_k, axis: str, n_shards: int):
    """Row log-sum-exp of masked sim over all ring blocks."""

    def step(carry, _):
        (mdk, mk), (mx, se) = carry
        sim = jnp.einsum("bmd,bnd->bmn", md_q, mdk,
                         preferred_element_type=jnp.float32)
        pair = mask_q[:, :, None] & mk[:, None, :]
        sim = jnp.where(pair, sim, NEG_INF)
        m_new = jnp.maximum(mx, jnp.max(sim, -1))
        se = se * jnp.exp(mx - m_new) + jnp.sum(
            jnp.exp(sim - m_new[..., None]), -1)
        mdk = jax.lax.ppermute(
            mdk, axis, [(s, (s + 1) % n_shards) for s in range(n_shards)])
        mk = jax.lax.ppermute(
            mk, axis, [(s, (s + 1) % n_shards) for s in range(n_shards)])
        return ((mdk, mk), (m_new, se)), None

    b, m_loc = mask_q.shape
    init = ((md_k, mask_k),
            (jnp.full((b, m_loc), -jnp.inf), jnp.zeros((b, m_loc))))
    (_, (mx, se)), _ = jax.lax.scan(step, init, None, length=n_shards)
    return mx + jnp.log(jnp.maximum(se, 1e-30))


def make_sequence_parallel_lightglue(mesh: Mesh, lg, axis: str = "seq"):
    """Token-sharded LightGlue forward over `mesh`'s `axis`.

    Same data dict as LightGlue.match; kpts/desc/mask token dims must be
    divisible by the axis size. Returns matches0/1 + mscores0/1 (global
    indices; no log_assignment — that is exactly the O(N^2) object this
    variant avoids).
    """
    nh = lg.num_heads
    th = lg.filter_threshold

    def local_fn(params, kpts0, desc0, mask0, size0,
                 kpts1, desc1, mask1, size1):
        n_shards = jax.lax.psum(1, axis)
        my_shard = jax.lax.axis_index(axis)
        attn = partial(_ring_attention_local, axis_name=axis)

        kn0 = normalize_keypoints(kpts0, size0)
        kn1 = normalize_keypoints(kpts1, size1)
        # official checkpoints have an Identity input_proj (empty dict)
        if "kernel" in params["input_proj"]:
            d0 = _linear(params["input_proj"], desc0.astype(jnp.float32))
            d1 = _linear(params["input_proj"], desc1.astype(jnp.float32))
        else:
            d0 = desc0.astype(jnp.float32)
            d1 = desc1.astype(jnp.float32)
        enc0 = rotary_encoding(params["posenc"], kn0)
        enc1 = rotary_encoding(params["posenc"], kn1)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *params["layers"])

        def body(carry, layer):
            c0, c1 = carry
            c0 = self_block(layer["self_attn"], c0, enc0, mask0, nh,
                            attn=attn)
            c1 = self_block(layer["self_attn"], c1, enc1, mask1, nh,
                            attn=attn)
            c0, c1 = cross_block(layer["cross_attn"], c0, c1, mask0,
                                 mask1, nh, attn=attn)
            return (c0, c1), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), stacked)

        ap = params["assign"][-1]
        dd = float(lg.descriptor_dim)
        md0 = _linear(ap["final_proj"], d0) / dd ** 0.25
        md1 = _linear(ap["final_proj"], d1) / dd ** 0.25
        z0 = _linear(ap["matchability"], d0)[..., 0]
        z1 = _linear(ap["matchability"], d1)[..., 0]

        # distributed double softmax: col lse first (over side0), then
        # the side-0 argmax pass FUSES the row lse (no extra ring pass)
        col_lse = _plain_lse(md1, mask1, md0, mask0, axis, n_shards)
        row_lse, bmax0, arg0 = _row_lse_and_argmax(
            md0, z1, mask0, mask1, md1, col_lse, axis, n_shards,
            my_shard, mask1.shape[1])
        _, bmax1, arg1 = _row_lse_and_argmax(
            md1, z0, mask1, mask0, md0, row_lse, axis, n_shards,
            my_shard, mask0.shape[1])

        # block value for queries on side0: add the row terms
        score0 = bmax0 - row_lse + jax.nn.log_sigmoid(z0)

        # mutual check needs the other side's argmax globally
        g_arg1 = jax.lax.all_gather(arg1, axis)      # (S, B, n_loc)
        g_arg1 = jnp.moveaxis(g_arg1, 0, 1).reshape(
            arg1.shape[0], -1)                        # (B, N1)
        g_mask1 = jnp.moveaxis(jax.lax.all_gather(mask1, axis),
                               0, 1).reshape(arg1.shape[0], -1)

        my_index0 = my_shard * mask0.shape[1] + \
            jnp.arange(mask0.shape[1])[None]
        back = jnp.take_along_axis(g_arg1, jnp.maximum(arg0, 0), 1)
        mutual0 = back == my_index0
        ms0 = jnp.exp(score0)
        # dense semantics (models/lightglue.py filter_matches): scores
        # are mutual-gated PRE-threshold; only matches apply the filter
        mut0 = mask0 & mutual0 & (arg0 >= 0) & \
            jnp.take_along_axis(g_mask1, jnp.maximum(arg0, 0), 1)
        mscores0 = jnp.where(mut0, ms0, 0.0)
        valid0 = mut0 & (ms0 > th)
        matches0 = jnp.where(valid0, arg0, -1).astype(jnp.int32)

        # side1 matches symmetric (mutual means the back-pointer hits us)
        g_arg0 = jnp.moveaxis(jax.lax.all_gather(arg0, axis),
                              0, 1).reshape(arg0.shape[0], -1)
        g_v0 = jnp.moveaxis(jax.lax.all_gather(valid0, axis),
                            0, 1).reshape(arg0.shape[0], -1)
        my_index1 = my_shard * mask1.shape[1] + \
            jnp.arange(mask1.shape[1])[None]
        back1 = jnp.take_along_axis(g_arg0, jnp.maximum(arg1, 0), 1)
        mutual1 = mask1 & (back1 == my_index1)
        ms1 = jnp.take_along_axis(
            jnp.moveaxis(jax.lax.all_gather(mscores0, axis), 0, 1)
            .reshape(arg1.shape[0], -1), jnp.maximum(arg1, 0), 1)
        mscores1 = jnp.where(mutual1, ms1, 0.0)
        valid1 = mutual1 & jnp.take_along_axis(
            g_v0, jnp.maximum(arg1, 0), 1)
        matches1 = jnp.where(valid1, arg1, -1).astype(jnp.int32)
        return matches0, matches1, mscores0, mscores1

    tok = P(None, axis)
    tok3 = P(None, axis, None)
    rep = P(None, None)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), tok3, tok3, tok, rep, tok3, tok3, tok, rep),
        out_specs=(tok, tok, tok, tok),
        check_vma=False,
    )

    @jax.jit
    def run(params, data):
        if data.get("size0") is None or data.get("size1") is None:
            raise ValueError(
                "sequence-parallel LightGlue requires explicit size0/"
                "size1 (per-shard keypoint extents would corrupt the "
                "rotary encoding)")
        with jax.default_matmul_precision(lg.precision):
            m0, m1, s0, s1 = fn(
                params, data["kpts0"], data["desc0"], data["mask0"],
                data["size0"], data["kpts1"], data["desc1"],
                data["mask1"], data["size1"])
        return {"matches0": m0, "matches1": m1,
                "mscores0": s0, "mscores1": s1}

    return run
