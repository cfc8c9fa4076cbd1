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
    thousand tokens * 64 dims => K/V ~1 MB, far under the VMEM budget),
    so each query tile is a single MXU matmul pair with the softmax in
    between — no HBM round-trip for the (TQ, Nk) score tile.

Kernel design notes (r5 shootout on a v5e chip, 16x4x4096x64):
  * bf16 operands, f32 accumulation, precision pinned DEFAULT — the
    package-global "highest" matmul precision would otherwise leak in
    when the kernel is traced outside a default_matmul_precision
    context, and Mosaic rejects highest-precision bf16 dots
    ("Bad lhs type"). The f32-operand version ran the MXU in
    multi-pass mode at ~1/3 throughput (BENCH_r04: 16.6% matcher MFU).
  * exp2 with the log2(e) factor folded into the query pre-scale. The
    row max IS subtracted: a clamped no-max variant measured ~8% faster
    (5.34 -> 4.90 ms/call) but the trained matchers' attention logits
    exceed any safe clamp at production sizes — the clamp flattened
    sharp attention rows and the full-res headline collapsed from 137
    to 34 GV inliers. After the subtraction exp2 needs no clamp at all
    (arguments are <= 0).
  * the softmax DENOMINATOR leaves the kernel as a second output and
    the normalization runs as one fused XLA epilogue — cheaper than a
    divide inside the (TQ, Nk) tile.
  * query tile 512 when the token count allows (28.5% MXU vs 26.1% at
    128); the (512, Nk) f32 score tile needs the raised VMEM limit.

Key masking multiplies the exponentials by the 0/1 mask, so masked
columns contribute exactly zero; a fully-masked row yields zeros (the
XLA fallback yields the uniform average — either way the caller's
validity mask discards those queries downstream).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_Q_TILE = 128
_Q_TILE_BIG = 512


def _xla_attention(q: Array, k: Array, v: Array, kmask: Array) -> Array:
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    sim = jnp.where(kmask[:, None, None, :], sim, -1e9)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, d_ref):
    q = q_ref[0, 0]  # (TQ, hd) bf16, PRE-scaled by hd**-0.5 * log2(e)
    k = k_ref[0, 0]  # (Nk, hd) bf16
    v = v_ref[0, 0]
    m = m_ref[0, 0]  # (Nk,) float 0/1
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    mx = jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp2(sim - mx) * m[None, :]
    o_ref[0, 0] = jnp.dot(p.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    d_ref[0, 0] = jnp.sum(p, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: Array, k: Array, v: Array, kmask: Array,
                    interpret: bool = False) -> Array:
    """Pallas masked attention. q (B,H,Nq,hd), k/v (B,H,Nk,hd), kmask (B,Nk).

    Nq must be a multiple of 128.
    """
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    tq = _Q_TILE_BIG if nq % _Q_TILE_BIG == 0 else _Q_TILE
    grid = (b, h, nq // tq)
    # (B, 1, Nk): the block's trailing two dims (1, Nk) match the array's,
    # satisfying the Mosaic (8, 128)-tiling rule for any batch size.
    mf = kmask.astype(jnp.float32)[:, None, :]
    # bf16 operands into the kernel: halves the K/V VMEM footprint and
    # HBM reads, and puts both MXU matmuls in single-pass bf16 mode
    # (accumulation stays f32 inside the kernel). Unit-norm descriptor
    # tokens lose ~1e-2 relative — far below any match decision margin.
    scale = hd ** -0.5 * math.log2(math.e)
    qb = (q * scale).astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    pv, den = pl.pallas_call(
        _flash_kernel,
        out_shape=(jax.ShapeDtypeStruct(q.shape, jnp.float32),
                   jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq, hd), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, hd), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tq, hd), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * nq * nk * hd,
            bytes_accessed=2 * b * h * (nq + 2 * nk) * hd,
            transcendentals=b * h * nq * nk,
        ),
        interpret=interpret,
    )(qb, kb, vb, mf)
    return (pv / jnp.maximum(den, 1e-20)).astype(q.dtype)


def masked_attention(q: Array, k: Array, v: Array, kmask: Array) -> Array:
    """Dispatch: Pallas on TPU for aligned shapes, XLA otherwise."""
    nq, hd = q.shape[-2], q.shape[-1]
    nk = k.shape[-2]
    on_tpu = jax.default_backend() == "tpu"
    aligned = nq % _Q_TILE == 0 and hd % 8 == 0 and nk % 128 == 0
    # K/V (bf16) + the f32 score tile at the largest query tile must
    # fit the raised VMEM limit comfortably
    tq = _Q_TILE_BIG if nq % _Q_TILE_BIG == 0 else _Q_TILE
    fits = nk * hd * 2 * 2 + tq * nk * 4 < 64 * 1024 * 1024
    if on_tpu and aligned and fits:
        return flash_attention(q, k, v, kmask)
    return _xla_attention(q, k, v, kmask)
