"""Ring attention: sequence-parallel masked attention over a mesh axis.

The matchers' token count is the keypoint-set size; full-frame matching
of very large images can exceed one chip's HBM (SURVEY §2.12's
"sequence-length" problem). Here the token axis is sharded over a mesh
axis and attention runs as a RING: each device holds one K/V block,
blocks rotate with ppermute, and softmax is accumulated online
(flash-attention style) so no device ever materializes the full
(N, N) score matrix — communication rides the ICI ring.

    ring = make_ring_attention(mesh, axis="seq")
    out = ring(q, k, v, kmask)       # same semantics as masked_attention

Numerics match ops.attention.masked_attention (additive -1e9 masking;
fully-masked queries receive a uniform distribution over the masked
keys, matching the single-device kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = jax.Array

NEG = -1e9


def _ring_attention_local(q: Array, k: Array, v: Array, m: Array,
                          axis_name: str) -> Array:
    """Per-shard body: q (B,H,nq,hd) local queries; k/v (B,H,nk,hd) and
    m (B,nk) local K/V block, rotated around the ring."""
    n_shards = jax.lax.psum(1, axis_name)
    scale = q.shape[-1] ** -0.5

    def step(carry, _):
        k, v, m, mx, num, den = carry
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * scale
        sim = sim + (m.astype(sim.dtype) - 1.0)[:, None, None, :] * -NEG
        bmax = jnp.max(sim, axis=-1)
        new_mx = jnp.maximum(mx, bmax)
        corr = jnp.exp(mx - new_mx)
        p = jnp.exp(sim - new_mx[..., None])
        num = num * corr[..., None] + jnp.einsum(
            "bhij,bhjd->bhid", p, v, preferred_element_type=jnp.float32)
        den = den * corr + jnp.sum(p, axis=-1)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        m = jax.lax.ppermute(m, axis_name, perm)
        return (k, v, m, new_mx, num, den), None

    b, h, nq, hd = q.shape
    init = (
        k, v, m,
        jnp.full((b, h, nq), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, nq, hd), jnp.float32),
        jnp.zeros((b, h, nq), jnp.float32),
    )
    (k, v, m, mx, num, den), _ = jax.lax.scan(
        step, init, None, length=n_shards)
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)


def make_ring_attention(mesh: Mesh, axis: str = "seq"):
    """Build a ring-attention callable over `mesh`'s `axis`.

    Inputs are GLOBAL arrays q/k/v (B, H, N, hd), kmask (B, N); N must be
    divisible by the axis size. Sharding: tokens over `axis`, everything
    else replicated (compose with a data axis by sharding B outside).
    """
    fn = shard_map(
        partial(_ring_attention_local, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, axis)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return jax.jit(fn)
