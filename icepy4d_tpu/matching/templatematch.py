"""FFT orientation-correlation template matching.

Replaces the reference's pyimgraft-derived OC tracker
(matching/templatematch.py:26-340: pyfftw plans + a python loop over
points) with one batched JAX program: every target's template/search
window is gathered with a vmapped dynamic_slice and the whole batch rides
a single batched 2-D FFT cross-correlation on device — the per-point
pyfftw loop becomes one fused program, and a whole season of slave images
can be batched as extra leading dims.

Semantics match the reference:
  * orientation images: f = conv2(img, [[1,0,i],[0,0,0],[-i,0,-1]]),
    normalized to unit magnitude (templatematch.py:332-340)
  * correlation of template (rot180) with conj(search) via zero-padded FFT
  * peak -> integer displacement; subpixel by thresholded weighted
    centroid over a +-min(edgedist, 4) window (templatematch.py:316-325)
  * SNR = peakCorr / meanAbsCorr; peaks at the domain edge are invalid
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass
class MatchResult:
    """Tracking results (ref templatematch.py:26-157 MatchResult)."""

    pu: np.ndarray
    pv: np.ndarray
    du: np.ndarray
    dv: np.ndarray
    peakCorr: np.ndarray
    meanAbsCorr: np.ndarray
    method: str = "OC"

    @property
    def snr(self) -> np.ndarray:
        return self.peakCorr / self.meanAbsCorr


@jax.jit
def forient(img: Array) -> Array:
    """Complex orientation image (ref templatematch.py:332-340)."""
    img = img.astype(jnp.float32)
    kr = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, -1.0]])
    ki = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])

    def conv(k):
        return jax.lax.conv_general_dilated(
            img[None, None], k[None, None], (1, 1), "SAME")[0, 0]

    r = conv(kr) + 1j * conv(ki)
    m = jnp.abs(r)
    return r / jnp.where(m == 0, 1.0, m)


@partial(jax.jit, static_argnames=("tw", "sw"))
def _oc_correlate(
    A_or: Array,
    B_or: Array,
    a_center: Array,   # (N, 2) int [u, v] template centers in A
    b_center: Array,   # (N, 2) int [u, v] search centers in B
    valid: Array,      # (N,) bool
    tw: int,
    sw: int,
):
    """Batched OC correlation. Returns (du, dv, peak, mean_abs, ok)
    relative to the window centers (caller adds the initial offset)."""
    ha, wa = A_or.shape
    hb, wb = B_or.shape

    a0 = jnp.stack([a_center[:, 1] - tw // 2, a_center[:, 0] - tw // 2], -1)
    b0 = jnp.stack([b_center[:, 1] - sw // 2, b_center[:, 0] - sw // 2], -1)
    in_a = ((a0[:, 0] >= 0) & (a0[:, 1] >= 0)
            & (a0[:, 0] + tw <= ha) & (a0[:, 1] + tw <= wa))
    in_b = ((b0[:, 0] >= 0) & (b0[:, 1] >= 0)
            & (b0[:, 0] + sw <= hb) & (b0[:, 1] + sw <= wb))
    ok = valid & in_a & in_b
    a0c = jnp.clip(a0, 0, jnp.asarray([ha - tw, wa - tw]))
    b0c = jnp.clip(b0, 0, jnp.asarray([hb - sw, wb - sw]))

    tmpl = jax.vmap(lambda o: jax.lax.dynamic_slice(A_or, (o[0], o[1]),
                                                    (tw, tw)))(a0c)
    srch = jax.vmap(lambda o: jax.lax.dynamic_slice(B_or, (o[0], o[1]),
                                                    (sw, sw)))(b0c)

    # zero-padded FFT cross-correlation: rot180(template) * conj(search)
    sz = sw + tw - 1
    fT = jnp.fft.fft2(tmpl[:, ::-1, ::-1], s=(sz, sz))
    fB = jnp.fft.fft2(jnp.conj(srch), s=(sz, sz))
    CC = jnp.real(jnp.fft.ifft2(fB * fT))                     # (N, sz, sz)

    # central region free of edge effects (ref :239-253)
    wkeep = (sw - tw) // 2
    cc0 = (sz - 1) // 2 - wkeep
    n_keep = 2 * wkeep + 1
    C = jax.lax.dynamic_slice(
        CC, (0, cc0, cc0), (CC.shape[0], n_keep, n_keep))

    flat = C.reshape(C.shape[0], -1)
    idx = jnp.argmax(flat, axis=1)
    peak = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0]
    mean_abs = jnp.mean(jnp.abs(C), axis=(1, 2))
    iy = idx // n_keep
    ix = idx % n_keep
    edge = jnp.minimum(jnp.minimum(iy, ix),
                       jnp.minimum(n_keep - 1 - iy, n_keep - 1 - ix))
    ok = ok & (edge > 0)

    # subpixel: thresholded weighted centroid over +-ww, ww=min(edge,4)
    ww = jnp.minimum(edge, 4)
    offs = jnp.arange(-4, 5)
    oy = offs[:, None] + jnp.zeros((1, 9), jnp.int32)
    ox = offs[None, :] + jnp.zeros((9, 1), jnp.int32)

    def centroid(Ci, iyi, ixi, wwi):
        yy = jnp.clip(iyi + oy, 0, n_keep - 1)
        xx = jnp.clip(ixi + ox, 0, n_keep - 1)
        c = Ci[yy, xx]
        msk = (jnp.abs(oy) <= wwi) & (jnp.abs(ox) <= wwi)
        c = jnp.where(msk, c, 0.0)
        nm = jnp.sum(msk)
        c = c - jnp.sum(jnp.abs(c)) / jnp.maximum(nm, 1) * msk
        c = jnp.maximum(c, 0.0)
        ssum = jnp.maximum(jnp.sum(c), 1e-12)
        dy = jnp.sum((iyi + oy - wkeep) * c) / ssum
        dx = jnp.sum((ixi + ox - wkeep) * c) / ssum
        return dy, dx

    dv, du = jax.vmap(centroid)(C, iy, ix, ww)
    return du, dv, peak, mean_abs, ok


class TemplateMatch:
    """Track points from image A into image B (ref templatematch.py:26-157).

    xy (n, 2) pixel coords in A; match() returns a MatchResult with du/dv
    displacements (NaN where tracking failed).
    """

    available_methods = ["OC"]

    def __init__(
        self,
        A: np.ndarray,
        B: np.ndarray,
        xy: np.ndarray,
        method: str = "OC",
        template_width: int = 128,
        search_width: int = 128 + 16,
        initialdu: float = 0.0,
        initialdv: float = 0.0,
        single_points: bool = True,
    ) -> None:
        if A.ndim != 2 or B.ndim != 2:
            raise ValueError("Provide grayscale images")
        if method not in self.available_methods:
            raise ValueError(f"Invalid method {method}")
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        self.A = A
        self.B = B
        self.xy = xy
        self.method = method
        self.template_width = int(template_width)
        self.search_width = int(search_width)
        self.initialdu = initialdu
        self.initialdv = initialdv
        self.result: MatchResult | None = None

    def match(self) -> MatchResult:
        A_or = forient(jnp.asarray(self.A, jnp.float32))
        B_or = forient(jnp.asarray(self.B, jnp.float32))
        res = oc_track(
            A_or, B_or, self.xy,
            template_width=self.template_width,
            search_width=self.search_width,
            initialdu=self.initialdu, initialdv=self.initialdv,
        )
        self.result = res
        return res


def oc_track(
    A_or: Array,
    B_or: Array,
    xy: np.ndarray,
    template_width: int = 128,
    search_width: int = 144,
    initialdu=0.0,
    initialdv=0.0,
) -> MatchResult:
    """Batched OC tracking of `xy` points given precomputed orientation
    images (compute them once per image with `forient`)."""
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    n = len(xy)
    initdu = np.broadcast_to(np.asarray(initialdu, np.float64), (n,)).copy()
    initdv = np.broadcast_to(np.asarray(initialdv, np.float64), (n,)).copy()

    valid_in = np.isfinite(xy).all(axis=1)
    p = np.where(valid_in[:, None], xy, 0.0)
    a_center = np.round(p).astype(np.int32)
    b_center = np.round(
        p + np.stack([initdu, initdv], -1)).astype(np.int32)
    act_du = (b_center[:, 0] - a_center[:, 0]).astype(np.float64)
    act_dv = (b_center[:, 1] - a_center[:, 1]).astype(np.float64)

    du_, dv_, peak, mean_abs, ok = _oc_correlate(
        A_or, B_or, jnp.asarray(a_center), jnp.asarray(b_center),
        jnp.asarray(valid_in), template_width, search_width)
    ok = np.asarray(ok)
    du = np.where(ok, np.asarray(du_) + act_du, np.nan)
    dv = np.where(ok, np.asarray(dv_) + act_dv, np.nan)
    return MatchResult(
        pu=a_center[:, 0].astype(np.float64),
        pv=a_center[:, 1].astype(np.float64),
        du=du,
        dv=dv,
        peakCorr=np.where(ok, np.asarray(peak), np.nan),
        meanAbsCorr=np.asarray(mean_abs),
    )
