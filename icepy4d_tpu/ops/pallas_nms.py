"""Fused SuperPoint NMS as a Pallas TPU kernel.

simple_nms (ref SuperGlue/models/superpoint.py:32-50) is five 9x9
max-pool passes plus masking — as XLA ops that is ~11 full HBM
round-trips over the (B, H, W) heatmap. This kernel computes the whole
suppression chain (and the border zeroing that follows it) in ONE pass:
row stripes are DMA'd HBM -> VMEM with a halo, all five pools run
VMEM-resident as separable row/col shifted maxes on the VPU, and only
the final suppressed scores go back to HBM.

Halo math: each of the 5 pools reaches `radius` rows/cols, so a stripe
needs 5 * radius rows of context on each side to produce exact results.

Numerics are exactly simple_nms + border zeroing: the parity test runs
this kernel in interpret mode against the XLA reference on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIPE = 128


def _pool2d(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 max pool, separable shifted maxes, -inf padding."""
    n, m = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)), constant_values=-jnp.inf)
    y = xp[0:n]
    for d in range(1, 2 * r + 1):
        y = jnp.maximum(y, xp[d:d + n])
    yp = jnp.pad(y, ((0, 0), (r, r)), constant_values=-jnp.inf)
    z = yp[:, 0:m]
    for d in range(1, 2 * r + 1):
        z = jnp.maximum(z, yp[:, d:d + m])
    return z


def _nms_stripe(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """simple_nms suppression chain on a VMEM-resident stripe."""
    max_mask = _pool2d(x, r) == x
    for _ in range(2):
        supp = _pool2d(jnp.where(max_mask, 1.0, 0.0), r) > 0
        ss = jnp.where(supp, 0.0, x)    # exact reference replacement
        new_max = (_pool2d(ss, r) == ss) & jnp.logical_not(supp)
        max_mask = max_mask | new_max
    return jnp.where(max_mask, x, 0.0)


def _kernel(hbm_ref, out_ref, scratch, sem, *, h, w, r, halo,
            h0, w0, border):
    b = pl.program_id(0)
    s = pl.program_id(1)
    win = STRIPE + 2 * halo
    row0 = s * STRIPE
    start = pl.multiple_of(jnp.clip(row0 - halo, 0, h - win), 8)

    dma = pltpu.make_async_copy(
        hbm_ref.at[b, pl.ds(start, win), :], scratch, sem)
    dma.start()
    dma.wait()

    res = _nms_stripe(scratch[:], r)
    # halo is a multiple of 8, so the offset is sublane-aligned; the
    # hint lets Mosaic prove it for the vector load
    off = pl.multiple_of(row0 - start, 8)
    scratch[:] = res                       # reuse: ref-level pl.ds slice
    center = scratch[pl.ds(off, STRIPE), :]

    # border zeroing against the ORIGINAL (pre-pad) extent h0 x w0
    rows = jax.lax.broadcasted_iota(jnp.int32, (STRIPE, w), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (STRIPE, w), 1)
    keep = ((rows >= border) & (rows < h0 - border)
            & (cols >= border) & (cols < w0 - border))
    out_ref[0] = jnp.where(keep, center, 0.0)


@partial(jax.jit, static_argnames=("nms_radius", "border", "h0", "w0",
                                   "interpret"))
def fused_nms_border(heat: jnp.ndarray, nms_radius: int, border: int,
                     h0: int, w0: int, interpret: bool = False):
    """simple_nms + border zeroing, one HBM pass. heat (B, H, W) f32;
    h0/w0 = original extent before cell padding."""
    b, h, w = heat.shape
    halo = -(-(5 * nms_radius) // 8) * 8   # sublane-aligned halo
    ph = (-h) % STRIPE
    pw = (-w) % 128                        # lane-aligned width
    if ph or pw:
        # pad value -1 < any score (scores are softmax probs >= 0):
        # real-region suppression is provably unaffected (pad cells
        # adjacent to content are never maxima), and the border mask
        # zeroes everything at/over the true extent anyway
        heat = jnp.pad(heat, ((0, 0), (0, ph), (0, pw)),
                       constant_values=-1.0)
    hp, wp = h + ph, w + pw
    if hp < STRIPE + 2 * halo:
        raise ValueError("image too short for the Pallas NMS stripe; "
                         "use the XLA path")

    out = pl.pallas_call(
        partial(_kernel, h=hp, w=wp, r=nms_radius, halo=halo,
                h0=h0, w0=w0, border=border),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        grid=(b, hp // STRIPE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, STRIPE, wp),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((STRIPE + 2 * halo, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # pool temporaries are ~12 stripe-sized live buffers; v5e has
        # 128 MiB physical VMEM, the default 16 MiB scoped limit is
        # just conservative
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(heat.astype(jnp.float32))
    return out[:, :h, :w]


def pallas_nms_available(h: int, nms_radius: int) -> bool:
    """Stripe kernel needs enough rows for one window."""
    hp = h + ((-h) % STRIPE)
    halo = -(-(5 * nms_radius) // 8) * 8
    return hp >= STRIPE + 2 * halo
