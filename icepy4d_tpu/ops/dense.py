"""Plane-sweep dense stereo — replaces Metashape's depth-map pipeline.

The reference delegates dense reconstruction to the closed-source
Metashape engine (metashape/metashape.py:198-244 buildDepthMaps /
buildDenseCloud). This module is the TPU-native equivalent:

- Fronto-parallel plane sweep in the reference camera's frame: for each
  depth hypothesis d, the secondary image is warped by the induced
  homography H(d) = K1 (R - t nT / d) K0^-1 and scored against the
  reference with windowed ZNCC (separable box-filter convs — all MXU/VPU
  friendly; XLA fuses the warp+score chain).
- The sweep STREAMS over depth planes with a lax.fori_loop carrying the
  running best/second-best costs and the parabola neighbors, so memory
  stays O(H*W) instead of O(H*W*D) — full-resolution 6000x4000 sweeps
  fit easily in HBM.
- Subpixel depth by parabolic refinement over inverse depth; validity by
  cost threshold + uniqueness ratio (best vs second-best).

Inputs are assumed undistorted (run ops.image.undistort_image upstream);
planes are sampled uniformly in INVERSE depth, which equalizes disparity
steps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops.image import bilinear_sample

Array = jax.Array


def relative_motion(E0: Array, E1: Array) -> tuple[Array, Array]:
    """R, t with x1 = R @ x0 + t from 4x4 world->cam extrinsics."""
    R = E1[:3, :3] @ E0[:3, :3].T
    t = E1[:3, 3] - R @ E0[:3, 3]
    return R, t


def plane_homography(K0: Array, K1: Array, R: Array, t: Array,
                     depth: Array) -> Array:
    """Homography mapping reference pixels to secondary pixels for the
    fronto-parallel plane Z = depth in the reference frame."""
    n = jnp.asarray([0.0, 0.0, 1.0])
    H = K1 @ (R + jnp.outer(t, n) / depth) @ jnp.linalg.inv(K0)
    return H


def _box_filter(x: Array, w: int) -> Array:
    """Separable (w x w) mean filter on (H, W) by shift-adds.

    Single-channel convs hit the MXU with 1-wide contractions (terribly
    slow on TPU); 2*w vectorized shifted adds run on the VPU at full
    width instead."""
    r = w // 2
    h, wd = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)))
    x = sum(xp[k:k + h] for k in range(w)) / w
    xp = jnp.pad(x, ((0, 0), (r, r)))
    return sum(xp[:, k:k + wd] for k in range(w)) / w


def _ref_stats(I0: Array, w: int) -> tuple[Array, Array]:
    """Loop-invariant reference-image window stats (mean, variance)."""
    m0 = _box_filter(I0, w)
    v0 = _box_filter(I0 * I0, w) - m0 * m0
    return m0, v0


def _zncc_cost(I0: Array, I1w: Array, w: int, eps: float = 1e-6,
               ref_stats: tuple | None = None) -> Array:
    """1 - ZNCC over (w x w) windows; in [0, 2], lower is better.

    ref_stats: precomputed _ref_stats(I0, w) — the sweep hoists them out
    of the hypothesis loop (2 of the 5 box filters are I0-only)."""
    m0, v0 = ref_stats if ref_stats is not None else _ref_stats(I0, w)
    m1 = _box_filter(I1w, w)
    v1 = _box_filter(I1w * I1w, w) - m1 * m1
    cov = _box_filter(I0 * I1w, w) - m0 * m1
    zncc = cov / jnp.sqrt(jnp.maximum(v0 * v1, eps))
    return 1.0 - jnp.clip(zncc, -1.0, 1.0)



def _streaming_sweep(cost_at, n_hyps: int, shape: tuple):
    """Shared streaming argmin over hypotheses with parabola neighbors
    and a NEIGHBOR-EXCLUDED second-best (a subpixel optimum between two
    hypotheses has near-equal adjacent costs; counting the neighbor as
    "second best" would wrongly fail the uniqueness test).

    cost_at(k) -> (cost (H, W), inbounds (H, W)).
    Returns (best, best_k, c_prev, c_next, second, best_inb).
    """
    h, w = shape
    big = jnp.float32(2.0)

    def body(k, carry):
        (best, best_k, c_m, c_p, prev_c, second, second_k,
         best_inb) = carry
        c, inb = cost_at(k)
        is_new = c < best
        # the hypothesis right after the current best supplies the
        # parabola's right neighbor
        c_p = jnp.where((k == best_k + 1) & ~is_new, c, c_p)
        # second best among hypotheses not adjacent to the best: the
        # displaced best becomes a candidate when far from the new best,
        # and a non-best cost is a candidate when far from the best
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
        c_p = jnp.where(is_new, big, c_p)
        best_k = jnp.where(is_new, k, best_k)
        best = jnp.where(is_new, c, best)
        best_inb = jnp.where(is_new, inb, best_inb)
        return (best, best_k, c_m, c_p, c, new_second, new_second_k,
                best_inb)

    init = (
        jnp.full((h, w), big), jnp.full((h, w), -1, jnp.int32),
        jnp.full((h, w), big), jnp.full((h, w), big),
        jnp.full((h, w), big), jnp.full((h, w), big),
        jnp.full((h, w), -99, jnp.int32),
        jnp.zeros((h, w), bool),
    )
    best, best_k, c_m, c_p, _, second, second_k, best_inb = \
        jax.lax.fori_loop(0, n_hyps, body, init)
    # the recorded second may have ended up adjacent after the best
    # moved; treat it as unreliable (uniq -> 1) rather than over-trust it
    second = jnp.where(jnp.abs(second_k - best_k) > 1, second, best)
    return best, best_k, c_m, c_p, second, best_inb


def _subpixel_delta(best, best_k, c_m, c_p, n_hyps: int):
    """Parabolic refinement over the hypothesis index."""
    big = jnp.float32(2.0)
    denom = c_m - 2.0 * best + c_p
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (c_m - c_p) / jnp.where(
                          jnp.abs(denom) > 1e-9, denom, 1.0), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (best_k > 0) & (best_k < n_hyps - 1) & (c_m < big) \
        & (c_p < big)
    return jnp.where(interior, delta, 0.0)


@partial(jax.jit, static_argnames=("n_planes", "window"))
def plane_sweep(
    I0: Array,
    I1: Array,
    K0: Array,
    K1: Array,
    E0: Array,
    E1: Array,
    depth_min: float,
    depth_max: float,
    n_planes: int = 96,
    window: int = 7,
) -> dict:
    """Sweep fronto-parallel planes; return per-pixel depth + validity.

    I0, I1: (H, W) grayscale float (undistorted). Returns dict with
    depth (H, W) [subpixel, in the reference frame], cost (H, W) best
    1-ZNCC, uniqueness (H, W) best/second-best ratio, valid-sampling
    mask (H, W) (warp landed inside I1 at the best plane).
    """
    h, w = I0.shape
    R, t = relative_motion(E0, E1)
    inv_d = jnp.linspace(1.0 / depth_max, 1.0 / depth_min, n_planes)

    ys, xs = jnp.mgrid[0:h, 0:w]
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).astype(jnp.float32)

    big = jnp.float32(2.0)  # max possible cost
    stats0 = _ref_stats(I0, window)

    def cost_at(k):
        H = plane_homography(K0, K1, R, t, 1.0 / inv_d[k])
        q = pix @ H.T
        xy = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-9, 1e-9,
                                    q[..., 2:])
        inb = ((xy[..., 0] >= 0) & (xy[..., 0] <= w - 1)
               & (xy[..., 1] >= 0) & (xy[..., 1] <= h - 1))
        I1w = bilinear_sample(I1, xy.reshape(-1, 2)).reshape(h, w)
        c = _zncc_cost(I0, I1w, window, ref_stats=stats0)
        return jnp.where(inb, c, big), inb

    best, best_k, c_m, c_p, second, best_inb = _streaming_sweep(
        cost_at, n_planes, (h, w))
    delta = _subpixel_delta(best, best_k, c_m, c_p, n_planes)
    step = (inv_d[-1] - inv_d[0]) / max(n_planes - 1, 1)
    inv_best = inv_d[0] + (best_k.astype(jnp.float32) + delta) * step
    depth = 1.0 / jnp.maximum(inv_best, 1e-9)

    return {
        "depth": depth,
        "cost": best,
        "uniqueness": best / jnp.maximum(second, 1e-6),
        "inbounds": best_inb & (best_k >= 0),
    }


@jax.jit
def depth_to_points(depth: Array, K0: Array, E0: Array,
                    mask: Array | None = None) -> tuple[Array, Array]:
    """Unproject a reference-frame depth map to WORLD points.

    Returns (points (H*W, 3), valid (H*W,)).
    """
    h, w = depth.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1).astype(jnp.float32)
    rays = pix @ jnp.linalg.inv(K0).T                  # cam-frame dirs
    Xc = rays * depth[..., None]
    Rcw = E0[:3, :3].T
    C = -Rcw @ E0[:3, 3]
    Xw = Xc.reshape(-1, 3) @ Rcw.T + C
    valid = jnp.ones((h * w,), bool) if mask is None else mask.reshape(-1)
    return Xw, valid


def disparity_sweep(
    I0r: Array,
    I1r: Array,
    disp_min: float,
    disp_max: float,
    n_disp: int = 96,
    window: int = 7,
) -> dict:
    """Dense matching of a RECTIFIED pair by disparity sweep.

    Every hypothesis is an x-shift of I1r (two static slices + a lerp —
    no gathers), scored with windowed ZNCC; the sweep streams with a
    fori_loop exactly like `plane_sweep`. Rectify with ops.rectify
    first; disparity d means I0r(x) corresponds to I1r(x - d).

    disp_min/disp_max are host floats; only the pad amount (quantized to
    a 64-px bucket) is static, so changing disparity ranges does NOT
    recompile the sweep (ranges change per camera pair / epoch).

    On TPU the sweep runs as the Pallas stripe kernel
    (ops/pallas_sweep.py) — the entire hypothesis loop stays
    VMEM-resident, measured 2.4x the fused-XLA loop at production
    size (74.7 ms vs 181.2 ms for 2000x3008x96 on v5e). Elsewhere the
    XLA streaming loop is used (numerics parity pinned by
    tests/test_pallas_sweep.py).

    Returns dict(disparity (H, W) subpixel, cost, uniqueness, inbounds).
    """
    raw = int(np.ceil(max(abs(float(disp_max)),
                          abs(float(disp_min))))) + 2
    pad = ((raw + 63) // 64) * 64   # pow-of-64 bucket: stable jit shapes
    lo = jnp.asarray(float(disp_min), jnp.float32)
    hi = jnp.asarray(float(disp_max), jnp.float32)
    if jax.default_backend() == "tpu":
        from icepy4d_tpu.ops.pallas_sweep import disparity_sweep_pallas

        return disparity_sweep_pallas(
            I0r, I1r, lo, hi, pad=pad, n_disp=n_disp, window=window)
    return _disparity_sweep(
        I0r, I1r, lo, hi, pad=pad, n_disp=n_disp, window=window)


@partial(jax.jit, static_argnames=("pad", "n_disp", "window"))
def _disparity_sweep(
    I0r: Array,
    I1r: Array,
    disp_min: Array,
    disp_max: Array,
    pad: int,
    n_disp: int = 96,
    window: int = 7,
) -> dict:
    h, w = I0r.shape
    big = jnp.float32(2.0)
    I1p = jnp.pad(I1r, ((0, 0), (pad, pad)))
    # d = min + k*step (not linspace: its different rounding flips
    # boundary in-bounds tests vs the reconstruction formula below)
    step_d = (disp_max - disp_min) / max(n_disp - 1, 1)
    disps = disp_min + jnp.arange(n_disp, dtype=jnp.float32) * step_d
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    stats0 = _ref_stats(I0r, window)

    def cost_at(k):
        d = disps[k]
        off = jnp.floor(d).astype(jnp.int32)
        frac = d - off.astype(jnp.float32)
        base = pad - off  # I1p column of I1r x=0 shifted by floor(d)
        a = jax.lax.dynamic_slice(I1p, (0, base - 1), (h, w))
        b = jax.lax.dynamic_slice(I1p, (0, base), (h, w))
        I1s = a * frac + b * (1.0 - frac)
        inb = (xs - d >= 0) & (xs - d <= w - 1)
        inb = jnp.broadcast_to(inb, (h, w))
        c = _zncc_cost(I0r, I1s, window, ref_stats=stats0)
        return jnp.where(inb, c, big), inb

    best, best_k, c_m, c_p, second, best_inb = _streaming_sweep(
        cost_at, n_disp, (h, w))
    delta = _subpixel_delta(best, best_k, c_m, c_p, n_disp)
    step = (disp_max - disp_min) / max(n_disp - 1, 1)
    disp = disp_min + (best_k.astype(jnp.float32) + delta) * step
    return {
        "disparity": disp,
        "cost": best,
        "uniqueness": best / jnp.maximum(second, 1e-6),
        "inbounds": best_inb & (best_k >= 0),
    }


@partial(jax.jit, static_argnames=("tau",))
def lr_consistency_mask(disp0: Array, disp1: Array,
                        tau: float = 1.0) -> Array:
    """Left-right consistency: x in view 0 with disparity d must map to a
    view-1 pixel whose (reverse) disparity agrees: |d0(x) + d1(x - d0)|
    <= tau. The TPU analogue of Metashape's depth filtering
    (metashape/metashape.py:214-222 depth_filter).

    disp0: view0->view1 disparities; disp1: view1->view0 (the sweep run
    with swapped, mirrored inputs yields it directly). Returns (H, W)
    bool mask for view 0.
    """
    h, w = disp0.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    x1 = xs - disp0                      # where each pixel lands in view1
    x1c = jnp.clip(x1, 0.0, w - 1.0)
    i0 = jnp.floor(x1c).astype(jnp.int32)
    f = x1c - i0.astype(jnp.float32)
    rows = jnp.arange(h)[:, None]
    d1 = (disp1[rows, i0] * (1.0 - f)
          + disp1[rows, jnp.minimum(i0 + 1, w - 1)] * f)
    inb = (x1 >= 0) & (x1 <= w - 1)
    return inb & (jnp.abs(disp0 + d1) <= tau)
