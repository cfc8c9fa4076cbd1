"""Pipeline-parallel LightGlue: transformer layers staged over a mesh axis.

SURVEY §2.12's pipeline-parallelism item: the reference has no
distributed runtime at all; here the matcher's stacked self/cross layers
are SPLIT across a ``pp`` mesh axis (each device group holds
n_layers/S contiguous layers) and tile-pair microbatches stream through
the stages GPipe-style:

  step t: stage s processes microbatch (t - s); activations hand off to
  stage s+1 via ``lax.ppermute`` over ICI; total steps = n_micro + S - 1
  (S - 1 bubble slots, amortized by streaming many microbatches).

Only the (mb, N, 256) token activations cross stages; positional
encodings and masks are recomputed per stage from the replicated inputs
(cheaper than shipping them). The assignment head runs data-parallel
afterwards.

This complements the other parallel matchers: DP (epoch_step), TP
(attention heads), SP (ring attention / lightglue_sp). PP is the right
axis when one pair's token count fits a chip but model layers dominate
latency and many pairs stream (a full epoch batch).

    pp_lg = make_pipeline_parallel_lightglue(mesh, lg, axis="pp")
    out = pp_lg(params, data)      # same dict as lg.match(params, data)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from icepy4d_tpu.models.lightglue import (
    _linear,
    cross_block,
    filter_matches,
    match_assignment,
    normalize_keypoints,
    rotary_encoding,
    self_block,
)

Array = jax.Array


def make_pipeline_parallel_lightglue(mesh: Mesh, lg, axis: str = "pp",
                                     n_micro: int | None = None):
    """Build a pipeline-parallel forward for LightGlue `lg` over
    `mesh[axis]` stages. n_layers must divide by the stage count; the
    pair batch must divide by n_micro (default: one microbatch per
    stage, the minimum that fills the pipeline)."""
    n_stages = mesh.shape[axis]
    if lg.n_layers % n_stages:
        raise ValueError(
            f"n_layers={lg.n_layers} not divisible by {n_stages} stages")
    nh = lg.num_heads

    def pp_match(params: dict, data: dict) -> dict:
        b = data["desc0"].shape[0]
        nm = n_micro or n_stages
        if b % nm:
            raise ValueError(f"batch {b} not divisible by n_micro={nm}")
        mb = b // nm

        kpts0 = normalize_keypoints(data["kpts0"], data.get("size0"))
        kpts1 = normalize_keypoints(data["kpts1"], data.get("size1"))
        proj = lambda d: _linear(params["input_proj"],
                                 d.astype(jnp.float32)) \
            if "kernel" in params["input_proj"] else d
        d0 = proj(data["desc0"])
        d1 = proj(data["desc1"])
        cos0, sin0 = rotary_encoding(params["posenc"], kpts0)
        cos1, sin1 = rotary_encoding(params["posenc"], kpts1)

        def to_micro(a):
            return a.reshape((nm, mb) + a.shape[1:])

        inputs = jax.tree.map(to_micro, {
            "d0": d0, "d1": d1,
            "cos0": cos0, "sin0": sin0, "cos1": cos1, "sin1": sin1,
            "mask0": data["mask0"], "mask1": data["mask1"],
        })
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *params["layers"])

        d0_out, d1_out = _pp_layers(mesh, axis, n_stages, nh, nm,
                                    stacked, inputs)

        with jax.default_matmul_precision(lg.precision):
            scores = match_assignment(params["assign"][-1], d0_out, d1_out,
                                      data["mask0"], data["mask1"])
        matches0, matches1, ms0, ms1 = filter_matches(
            scores, lg.filter_threshold)
        return {
            "matches0": jnp.where(data["mask0"], matches0, -1),
            "matches1": jnp.where(data["mask1"], matches1, -1),
            "mscores0": jnp.where(data["mask0"], ms0, 0.0),
            "mscores1": jnp.where(data["mask1"], ms1, 0.0),
            "log_assignment": scores,
        }

    def _pp_layers(mesh, axis, n_stages, nh, nm, stacked, inputs):
        in_specs = (
            jax.tree.map(lambda _: P(axis), stacked),   # layer-sharded
            jax.tree.map(lambda _: P(), inputs),        # replicated
        )

        @partial(shard_map, mesh=mesh, in_specs=in_specs,
                 out_specs=(P(axis), P(axis)), check_vma=False)
        def run(local_layers, inp):
            stage = jax.lax.axis_index(axis)
            mb = inp["d0"].shape[1]

            def pick(t):
                """Microbatch this stage works on at step t (clipped;
                bubble steps compute on garbage and are discarded)."""
                m = t - stage
                return jnp.clip(m, 0, nm - 1), (m >= 0) & (m < nm)

            def local_forward(c0, c1, sel):
                def body(carry, layer):
                    a0, a1 = carry
                    a0 = self_block(layer["self_attn"], a0,
                                    (sel["cos0"], sel["sin0"]),
                                    sel["mask0"], nh)
                    a1 = self_block(layer["self_attn"], a1,
                                    (sel["cos1"], sel["sin1"]),
                                    sel["mask1"], nh)
                    a0, a1 = cross_block(layer["cross_attn"], a0, a1,
                                         sel["mask0"], sel["mask1"], nh)
                    return (a0, a1), None

                (c0, c1), _ = jax.lax.scan(body, (c0, c1), local_layers)
                return c0, c1

            shift = [(s, s + 1) for s in range(n_stages - 1)]

            def step(carry, t):
                act0, act1, out0, out1 = carry
                m_idx, _ = pick(t)
                sel = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, m_idx, 0, keepdims=False), inp)
                # stage 0 ingests fresh microbatches; others consume
                # what arrived from the previous stage
                is_first = stage == 0
                c0 = jnp.where(is_first, sel["d0"], act0)
                c1 = jnp.where(is_first, sel["d1"], act1)
                y0, y1 = local_forward(c0, c1, sel)
                # last stage banks finished microbatch t - (S-1)
                m_out = t - (n_stages - 1)
                do = (stage == n_stages - 1) & (m_out >= 0)
                w_idx = jnp.clip(m_out, 0, nm - 1)
                new0 = jax.lax.dynamic_update_index_in_dim(
                    out0, y0, w_idx, 0)
                new1 = jax.lax.dynamic_update_index_in_dim(
                    out1, y1, w_idx, 0)
                out0 = jnp.where(do, new0, out0)
                out1 = jnp.where(do, new1, out1)
                if shift:
                    y0 = jax.lax.ppermute(y0, axis, shift)
                    y1 = jax.lax.ppermute(y1, axis, shift)
                return (y0, y1, out0, out1), None

            z0 = jnp.zeros_like(inp["d0"][0])
            z1 = jnp.zeros_like(inp["d1"][0])
            o0 = jnp.zeros_like(inp["d0"])
            o1 = jnp.zeros_like(inp["d1"])
            (_, _, o0, o1), _ = jax.lax.scan(
                step, (z0, z1, o0, o1),
                jnp.arange(nm + n_stages - 1))
            return o0, o1

        with jax.default_matmul_precision(lg.precision):
            o0, o1 = run(stacked, inputs)
        # out_specs P(axis) concatenates every stage's buffer along the
        # microbatch dim; only the LAST stage's block holds results
        o0 = o0[-nm:].reshape((-1,) + o0.shape[2:])
        o1 = o1[-nm:].reshape((-1,) + o1.shape[2:])
        return o0, o1

    return pp_match
