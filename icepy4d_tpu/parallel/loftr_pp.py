"""Pipeline-parallel LoFTR coarse transformer.

Completes the GPipe pattern across both matcher families (see
parallel/lightglue_pp.py): the coarse LocalFeatureTransformer's stacked
(self, cross) layer pairs are SPLIT over a ``pp`` mesh axis and
tile-pair microbatches stream through the stages with ``lax.ppermute``
activation handoff. Only the two (mb, L, 256) token sets cross stages;
masks are re-read from the replicated inputs per stage.

The backbone and fine stage stay data-parallel (they dominate FLOPs but
have no inter-layer depth worth staging); this targets seasons where
many tile pairs stream through a deep coarse transformer.

    pp_coarse = make_pipeline_parallel_loftr_coarse(mesh, model)
    c0, c1 = pp_coarse(params["coarse"], c0, c1, mask0, mask1)
    # == lft_apply(params["coarse"], ...) batched over pairs
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from icepy4d_tpu.models.loftr import encoder_layer_apply

Array = jax.Array


def make_pipeline_parallel_loftr_coarse(mesh: Mesh, model,
                                        axis: str = "pp",
                                        n_micro: int | None = None):
    """Staged coarse transformer for LoFTR `model` over `mesh[axis]`.

    Returns pp_coarse(coarse_params, c0, c1, mask0, mask1) operating on
    a PAIR BATCH: c0/c1 (B, L, D), mask0/mask1 (B, L); B must divide by
    n_micro (default: one microbatch per stage)."""
    n_stages = mesh.shape[axis]
    if model.coarse_pairs % n_stages:
        raise ValueError(
            f"coarse_pairs={model.coarse_pairs} not divisible by "
            f"{n_stages} stages")
    nhead = model.nhead

    def pp_coarse(coarse_params, c0, c1, mask0, mask1):
        b = c0.shape[0]
        nm = n_micro or n_stages
        if b % nm:
            raise ValueError(f"batch {b} not divisible by n_micro={nm}")
        mb = b // nm

        def to_micro(a):
            return a.reshape((nm, mb) + a.shape[1:])

        inputs = jax.tree.map(to_micro, {
            "c0": c0, "c1": c1, "m0": mask0, "m1": mask1})

        in_specs = (
            jax.tree.map(lambda _: P(axis), coarse_params),
            jax.tree.map(lambda _: P(), inputs),
        )

        @partial(shard_map, mesh=mesh, in_specs=in_specs,
                 out_specs=(P(axis), P(axis)), check_vma=False)
        def run(local_pairs, inp):
            stage = jax.lax.axis_index(axis)

            def local_forward(f0, f1, sel):
                def body(carry, lp):
                    a0, a1 = carry
                    a0 = encoder_layer_apply(
                        lp["self"], a0, a0, sel["m0"], nhead)
                    a1 = encoder_layer_apply(
                        lp["self"], a1, a1, sel["m1"], nhead)
                    a0 = encoder_layer_apply(
                        lp["cross"], a0, a1, sel["m1"], nhead)
                    a1 = encoder_layer_apply(
                        lp["cross"], a1, a0, sel["m0"], nhead)
                    return (a0, a1), None

                (f0, f1), _ = jax.lax.scan(body, (f0, f1), local_pairs)
                return f0, f1

            shift = [(s, s + 1) for s in range(n_stages - 1)]

            def step(carry, t):
                act0, act1, out0, out1 = carry
                m_idx = jnp.clip(t - stage, 0, nm - 1)
                sel = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, m_idx, 0, keepdims=False), inp)
                is_first = stage == 0
                f0 = jnp.where(is_first, sel["c0"], act0)
                f1 = jnp.where(is_first, sel["c1"], act1)
                y0, y1 = local_forward(f0, f1, sel)
                m_out = t - (n_stages - 1)
                do = (stage == n_stages - 1) & (m_out >= 0)
                w_idx = jnp.clip(m_out, 0, nm - 1)
                out0 = jnp.where(do, jax.lax.dynamic_update_index_in_dim(
                    out0, y0, w_idx, 0), out0)
                out1 = jnp.where(do, jax.lax.dynamic_update_index_in_dim(
                    out1, y1, w_idx, 0), out1)
                if shift:
                    y0 = jax.lax.ppermute(y0, axis, shift)
                    y1 = jax.lax.ppermute(y1, axis, shift)
                return (y0, y1, out0, out1), None

            z0 = jnp.zeros_like(inp["c0"][0])
            z1 = jnp.zeros_like(inp["c1"][0])
            o0 = jnp.zeros_like(inp["c0"])
            o1 = jnp.zeros_like(inp["c1"])
            (_, _, o0, o1), _ = jax.lax.scan(
                step, (z0, z1, o0, o1), jnp.arange(nm + n_stages - 1))
            return o0, o1

        with jax.default_matmul_precision(model.precision):
            o0, o1 = run(coarse_params, inputs)
        # out_specs P(axis) stacks every stage's buffer; the LAST
        # stage's block holds the results
        o0 = o0[-nm:].reshape((-1,) + o0.shape[2:])
        o1 = o1[-nm:].reshape((-1,) + o1.shape[2:])
        return o0, o1

    return pp_coarse
