"""Fused masked attention for the matcher transformers.

The matchers' hot kernel (ref thirdparty/LightGlue/lightglue/lightglue.py:
92-131 SDPA, thirdparty/SuperGlue/models/superglue.py:96-129 einsum
attention) re-designed for TPU:

  * `masked_attention` — one (B,H,N,hd) masked softmax-attention program.
    On TPU with aligned shapes it runs the Pallas kernel below; otherwise
    one fused XLA einsum program (XLA already fuses scale+mask+softmax
    into the matmuls on TPU, so the fallback is fast too).

  * `_flash_kernel` — Pallas kernel tiling queries over the grid; keys/
    values for one (batch, head) live in VMEM (keypoint sets are a few
    thousand tokens * 64 dims => K/V ~1 MB, far under the 16 MB VMEM
    budget), so each query tile is a single MXU matmul pair with the
    softmax in between — no HBM round-trip for the (TQ, Nk) score tile.

Key masking uses additive -1e9 (finite, so fully-masked rows yield a
uniform distribution instead of NaN; invalid queries are discarded by the
caller's validity mask downstream).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_Q_TILE = 128


def _xla_attention(q: Array, k: Array, v: Array, kmask: Array) -> Array:
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    sim = jnp.where(kmask[:, None, None, :], sim, -1e9)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    """Q/K/V arrive as bfloat16 (halved VMEM + HBM traffic); both MXU
    matmuls take bf16 operands with f32 accumulation — the f32-operand
    version ran the MXU in multi-pass mode at ~1/3 the throughput and
    capped the matcher at 16.6% MFU (BENCH_r04). Softmax stays f32."""
    q = q_ref[0, 0]  # (TQ, hd) bf16
    k = k_ref[0, 0]  # (Nk, hd) bf16
    v = v_ref[0, 0]
    m = m_ref[0, 0]  # (Nk,) float 0/1
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    sim = sim + (m - 1.0)[None, :] * 1e9
    p = jax.nn.softmax(sim, axis=-1)
    o_ref[0, 0] = jnp.dot(p.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: Array, k: Array, v: Array, kmask: Array,
                    interpret: bool = False) -> Array:
    """Pallas masked attention. q (B,H,Nq,hd), k/v (B,H,Nk,hd), kmask (B,Nk).

    Nq must be a multiple of 128.
    """
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    grid = (b, h, nq // _Q_TILE)
    # (B, 1, Nk): the block's trailing two dims (1, Nk) match the array's,
    # satisfying the Mosaic (8, 128)-tiling rule for any batch size.
    mf = kmask.astype(jnp.float32)[:, None, :]
    # bf16 operands into the kernel: halves the K/V VMEM footprint and
    # HBM reads, and puts both MXU matmuls in single-pass bf16 mode
    # (accumulation stays f32 inside the kernel). Unit-norm descriptor
    # tokens lose ~1e-2 relative — far below any match decision margin.
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    return pl.pallas_call(
        partial(_flash_kernel, scale=hd ** -0.5),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, _Q_TILE, hd), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _Q_TILE, hd), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * nq * nk * hd,
            bytes_accessed=2 * b * h * (nq + 2 * nk) * hd,
            transcendentals=b * h * nq * nk,
        ),
        interpret=interpret,
    )(qb, kb, vb, mf)


def masked_attention(q: Array, k: Array, v: Array, kmask: Array) -> Array:
    """Dispatch: Pallas on TPU for aligned shapes, XLA otherwise."""
    nq, hd = q.shape[-2], q.shape[-1]
    nk = k.shape[-2]
    on_tpu = jax.default_backend() == "tpu"
    aligned = nq % _Q_TILE == 0 and hd % 8 == 0 and nk % 128 == 0
    # K/V (bf16) + f32 score tile must fit VMEM comfortably
    fits = nk * hd * 2 * 2 + _Q_TILE * nk * 4 < 8 * 1024 * 1024
    if on_tpu and aligned and fits:
        return flash_attention(q, k, v, kmask)
    return _xla_attention(q, k, v, kmask)
