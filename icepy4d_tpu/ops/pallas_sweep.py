"""Pallas TPU kernel for the dense disparity sweep.

The XLA streaming sweep (ops/dense.py::_disparity_sweep) re-reads the
rectified pair from HBM for every one of the ~96 disparity hypotheses
(box filters + elementwise = many full-frame HBM round trips per
hypothesis). This kernel keeps a row stripe of BOTH images VMEM-resident
and runs the ENTIRE hypothesis loop on it:

  - disparity shift = dynamic circular lane roll (pltpu.roll) of the
    pre-padded secondary stripe + two static slices + lerp;
  - ZNCC via separable shift-add box filters on the VPU (reference
    stats hoisted out of the loop);
  - the streaming argmin state (best/second/parabola neighbors) lives
    in the loop carry, never touching HBM;
  - one write per output at the end: disparity, cost, uniqueness,
    inbounds.

HBM traffic drops from O(n_disp * k * H * W) to O(H * W) reads + 4
output writes. Numerics match the XLA path (parity test in
tests/test_pallas_sweep.py runs interpret mode on CPU; subpixel deltas
agree to f32 rounding).

MEASURED (v5e): at 512x1024x96 the kernel only tied the fused-XLA loop
(35.1 vs 36.6 ms — fixed overheads dominate small frames), but at the
PRODUCTION 2000x3008x96 frame it is 2.4x faster: 74.7 ms vs 181.2 ms
(round 5). The XLA loop's streaming-argmin carry (8 full-frame maps)
round-trips ~390 MB of HBM per hypothesis at large frames; here the
carry lives in VMEM and HBM sees only the input stripes once plus the
4 output maps (~0.16 GB total vs ~37 GB). This kernel is the TPU
production path (ops/dense.py::disparity_sweep dispatches on backend).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIPE = 128
BIG = 2.0


def _box(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Separable (w x w) mean filter with zero padding (matches
    ops/dense.py::_box_filter)."""
    r = w // 2
    h, wd = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)))
    x = sum(xp[k:k + h] for k in range(w)) / w
    xp = jnp.pad(x, ((0, 0), (r, r)))
    return sum(xp[:, k:k + wd] for k in range(w)) / w


def _kernel(disp_ref, i0_hbm, i1_hbm, d_out, c_out, u_out, b_out,
            i0_s, i1_s, sem, *, h, w, wp0, pad, n_disp, window, halo):
    s = pl.program_id(0)
    row0 = s * STRIPE
    win = STRIPE + 2 * halo

    dma0 = pltpu.make_async_copy(
        i0_hbm.at[pl.ds(row0, win), :], i0_s, sem.at[0])
    dma1 = pltpu.make_async_copy(
        i1_hbm.at[pl.ds(row0, win), :], i1_s, sem.at[1])
    dma0.start()
    dma1.start()
    dma0.wait()
    dma1.wait()

    disp_min = disp_ref[0, 0]
    step = disp_ref[0, 1]
    # all arrays stay at the lane-aligned width wp0 (Mosaic wants
    # 128-multiple slices); cols >= w are zero pad, masked by `inb`
    # and sliced away by the host wrapper
    i0 = i0_s[:]                           # (win, wp0)
    m0 = _box(i0, window)
    v0 = _box(i0 * i0, window) - m0 * m0

    cols = jax.lax.broadcasted_iota(
        jnp.int32, (win, wp0), 1).astype(jnp.float32)

    def cost_at(k):
        d = disp_min + k.astype(jnp.float32) * step
        off = jnp.floor(d).astype(jnp.int32)
        frac = d - off.astype(jnp.float32)
        # two rolls with LANE-ALIGNED slices (pad is a 128-multiple):
        # b[:, x] = i1p[:, pad + x - off], a[:, x] = i1p[:, pad + x - off - 1]
        b = pltpu.roll(i1_s[:], off, 1)[:, pad:pad + wp0]
        a = pltpu.roll(i1_s[:], off + 1, 1)[:, pad:pad + wp0]
        i1s = a * frac + b * (1.0 - frac)
        # columns beyond the true width must be ZERO like the XLA
        # path's (w-wide) I1s — the roll can drag content into them
        i1s = jnp.where(cols < w, i1s, 0.0)
        m1 = _box(i1s, window)
        v1 = _box(i1s * i1s, window) - m1 * m1
        cov = _box(i0 * i1s, window) - m0 * m1
        zncc = cov / jnp.sqrt(jnp.maximum(v0 * v1, 1e-6))
        c = 1.0 - jnp.clip(zncc, -1.0, 1.0)
        inb = jnp.where((cols - d >= 0) & (cols - d <= w - 1), 1.0, 0.0)
        return jnp.where(inb > 0.5, c, BIG), inb

    def body(k, carry):
        (best, best_k, c_m, c_p, prev_c, second, second_k,
         best_inb) = carry
        c, inb = cost_at(k)
        is_new = c < best
        c_p = jnp.where((k == best_k + 1) & ~is_new, c, c_p)
        disp_ok = jnp.abs(k - best_k) > 1
        new_second = jnp.where(
            is_new,
            jnp.where(disp_ok & (best < second), best, second),
            jnp.where(disp_ok & (c < second), c, second))
        new_second_k = jnp.where(
            is_new,
            jnp.where(disp_ok & (best < second), best_k, second_k),
            jnp.where(disp_ok & (c < second), k, second_k))
        c_m = jnp.where(is_new, prev_c, c_m)
        c_p = jnp.where(is_new, BIG, c_p)
        best_k = jnp.where(is_new, k, best_k)
        best = jnp.where(is_new, c, best)
        best_inb = jnp.where(is_new, inb, best_inb)
        return (best, best_k, c_m, c_p, c, new_second, new_second_k,
                best_inb)

    shape = (win, wp0)
    init = (
        jnp.full(shape, BIG), jnp.full(shape, -1, jnp.int32),
        jnp.full(shape, BIG), jnp.full(shape, BIG),
        jnp.full(shape, BIG), jnp.full(shape, BIG),
        jnp.full(shape, -99, jnp.int32),
        jnp.zeros(shape, jnp.float32),
    )
    best, best_k, c_m, c_p, _, second, second_k, best_inb = \
        jax.lax.fori_loop(0, n_disp, body, init)

    second = jnp.where(jnp.abs(second_k - best_k) > 1, second, best)

    denom = c_m - 2.0 * best + c_p
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (c_m - c_p) / jnp.where(
                          jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (best_k > 0) & (best_k < n_disp - 1) & (c_m < BIG) \
        & (c_p < BIG)
    delta = jnp.where(interior, delta, 0.0)
    disp = disp_min + (best_k.astype(jnp.float32) + delta) * step

    ctr = slice(halo, halo + STRIPE)
    d_out[:] = disp[ctr]
    c_out[:] = best[ctr]
    u_out[:] = best[ctr] / jnp.maximum(second[ctr], 1e-6)
    b_out[:] = jnp.where(
        (best_inb[ctr] > 0.5) & (best_k[ctr] >= 0), 1.0, 0.0)


@partial(jax.jit, static_argnames=("pad", "n_disp", "window",
                                   "interpret"))
def disparity_sweep_pallas(
    I0r: jnp.ndarray,
    I1r: jnp.ndarray,
    disp_min,
    disp_max,
    pad: int,
    n_disp: int = 96,
    window: int = 7,
    interpret: bool = False,
) -> dict:
    """Drop-in Pallas replacement for ops/dense.py::_disparity_sweep."""
    h, w = I0r.shape
    halo = -(-(window // 2) // 8) * 8      # sublane-aligned halo
    hp = h + ((-h) % STRIPE)
    wp0 = w + ((-w) % 128)                 # lane-aligned working width
    pad_k = pad + ((-pad) % 128)           # lane-aligned roll margin
    # secondary: [pad_k | content | margin], total lane-aligned and wide
    # enough that any roll in [-pad, pad+1] stays clear of wraparound
    wp1 = pad_k + wp0 + pad_k
    i1p = jnp.zeros((hp + 2 * halo, wp1), jnp.float32)
    i1p = jax.lax.dynamic_update_slice(
        i1p, I1r.astype(jnp.float32), (halo, pad_k))
    i0p = jnp.zeros((hp + 2 * halo, wp0), jnp.float32)
    i0p = jax.lax.dynamic_update_slice(
        i0p, I0r.astype(jnp.float32), (halo, 0))

    step = (jnp.asarray(disp_max, jnp.float32)
            - jnp.asarray(disp_min, jnp.float32)) / max(n_disp - 1, 1)
    dparams = jnp.asarray(
        [[disp_min, step]], jnp.float32)

    grid = (hp // STRIPE,)
    out_shapes = [jax.ShapeDtypeStruct((hp, wp0), jnp.float32)
                  for _ in range(4)]
    out_spec = pl.BlockSpec((STRIPE, wp0), lambda s: (s, 0),
                            memory_space=pltpu.VMEM)
    disp, cost, uniq, inb = pl.pallas_call(
        partial(_kernel, h=hp, w=w, wp0=wp0, pad=pad_k, n_disp=n_disp,
                window=window, halo=halo),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[out_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((STRIPE + 2 * halo, wp0), jnp.float32),
            pltpu.VMEM((STRIPE + 2 * halo, wp1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dparams, i0p, i1p)
    return {
        "disparity": disp[:h, :w],
        "cost": cost[:h, :w],
        "uniqueness": uniq[:h, :w],
        "inbounds": inb[:h, :w] > 0.5,
    }
