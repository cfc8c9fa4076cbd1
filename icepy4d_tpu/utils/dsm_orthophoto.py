"""DSM gridding, orthophoto sampling, DEM differencing — on device.

Replaces the reference's host-side products:
- build_dsm (utils/dsm_orthophoto.py:15-171): pandas groupby binning +
  scipy LinearNDInterpolator -> here one scatter-add binned mean plus an
  iterative masked-diffusion hole fill (pure XLA; the fill radius is the
  iteration count).
- generate_ortophoto (:179-234): project DSM cells into a camera and
  bilinear-sample colors — vmapped projection + gather.
- DemOfDifference (post_processing/cloudcompare_fun.py:74-216,
  cloudComPy ComputeVolume25D) -> dem_of_difference: masked grid
  difference with added/removed volume report.

GeoTIFF export works when rasterio is available (it is optional);
save_dsm_npz always works.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops.geometry import project_points

Array = jax.Array
logger = logging.getLogger("icepy4d_tpu")


@dataclass
class DSM:
    """Regular elevation grid (ref utils/dsm_orthophoto.py DSM class)."""

    z: np.ndarray        # (H, W) elevation, NaN where empty
    mask: np.ndarray     # (H, W) True where observed/filled
    xx: np.ndarray       # (W,) cell-center x coords
    yy: np.ndarray       # (H,) cell-center y coords
    res: float
    count: np.ndarray | None = None  # (H, W) points binned per cell

    def cell_xyz(self) -> np.ndarray:
        """(H*W, 3) cell centers with elevations (NaN-safe)."""
        gx, gy = np.meshgrid(self.xx, self.yy)
        return np.stack([gx.ravel(), gy.ravel(),
                         np.nan_to_num(self.z).ravel()], -1)


@partial(jax.jit, static_argnames=("shape", "fill_iters"))
def _grid_points(points: Array, x0: float, y0: float, res: float,
                 shape: tuple, fill_iters: int = 0):
    h, w = shape
    ix = jnp.floor((points[:, 0] - x0) / res).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - y0) / res).astype(jnp.int32)
    ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) \
        & jnp.isfinite(points).all(axis=1)
    lin = jnp.where(ok, iy * w + ix, h * w)  # out-of-range -> dump slot
    zsum = jnp.zeros((h * w + 1,)).at[lin].add(
        jnp.where(ok, points[:, 2], 0.0))
    cnt = jnp.zeros((h * w + 1,)).at[lin].add(ok.astype(jnp.float32))
    z = (zsum[:-1] / jnp.maximum(cnt[:-1], 1.0)).reshape(h, w)
    mask = (cnt[:-1] > 0).reshape(h, w)

    def fill(_, carry):
        z, m = carry
        mf = m.astype(z.dtype)
        k = jnp.ones((3, 3), z.dtype)
        conv = lambda a: jax.lax.conv_general_dilated(
            a[None, None], k[None, None], (1, 1), "SAME")[0, 0]
        s = conv(z * mf)
        n = conv(mf)
        znew = jnp.where(m, z, s / jnp.maximum(n, 1.0))
        return znew, m | (n > 0)

    filled_mask = mask
    if fill_iters > 0:
        z, filled_mask = jax.lax.fori_loop(0, fill_iters, fill, (z, mask))
    return z, mask, filled_mask, cnt[:-1].reshape(h, w)


def build_dsm(
    points: np.ndarray,
    dsm_step: float = 1.0,
    xlim: tuple | None = None,
    ylim: tuple | None = None,
    fill_holes: bool = True,
    fill_iters: int = 10,
    make_dsm_mask: bool = False,
) -> DSM:
    """Bin points (N, 3) into a regular grid of mean elevations.

    Mirrors ref build_dsm (utils/dsm_orthophoto.py:15-171): XY binning to
    `dsm_step`, mean per cell, hole interpolation limited to
    `fill_iters` cells from data. Returns a DSM.
    """
    points = np.asarray(points, np.float32)
    pts = points[np.isfinite(points).all(axis=1)]
    if xlim is None:
        xlim = (float(np.floor(pts[:, 0].min())),
                float(np.ceil(pts[:, 0].max())))
    if ylim is None:
        ylim = (float(np.floor(pts[:, 1].min())),
                float(np.ceil(pts[:, 1].max())))
    w = max(int(np.ceil((xlim[1] - xlim[0]) / dsm_step)), 1)
    h = max(int(np.ceil((ylim[1] - ylim[0]) / dsm_step)), 1)
    z, mask, filled, cnt = _grid_points(
        jnp.asarray(points), xlim[0], ylim[0], dsm_step, (h, w),
        fill_iters=fill_iters if fill_holes else 0)
    z = np.asarray(z)
    mask_out = np.asarray(filled if fill_holes else mask)
    z = np.where(mask_out, z, np.nan)
    xx = xlim[0] + (np.arange(w) + 0.5) * dsm_step
    yy = ylim[0] + (np.arange(h) + 0.5) * dsm_step
    logger.info("DSM %dx%d cells at %.2f m, %.1f%% observed",
                h, w, dsm_step, 100.0 * np.asarray(mask).mean())
    return DSM(z=z, mask=mask_out, xx=xx, yy=yy, res=float(dsm_step),
               count=np.asarray(cnt))


def generate_orthophoto(
    image: np.ndarray,
    dsm: DSM,
    camera,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample image colors at every DSM cell (ref :179-234).

    Returns (rgb (H, W, C) float in [0,1], valid (H, W))."""
    from icepy4d_tpu.ops.image import bilinear_sample

    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    xyz = jnp.asarray(dsm.cell_xyz(), jnp.float32)
    xy = project_points(xyz, jnp.asarray(camera.K),
                        jnp.asarray(camera.extrinsics),
                        jnp.asarray(camera.dist))
    h_img, w_img = img.shape[:2]
    inb = ((xy[:, 0] >= 0) & (xy[:, 0] <= w_img - 1)
           & (xy[:, 1] >= 0) & (xy[:, 1] <= h_img - 1))
    rgb = bilinear_sample(img, xy)
    hh, ww = dsm.z.shape
    rgb = np.asarray(rgb).reshape(hh, ww, -1)
    valid = np.asarray(inb).reshape(hh, ww) & dsm.mask
    return np.where(valid[..., None], rgb, 0.0), valid


@dataclass
class VolumeReport:
    added: float
    removed: float
    net: float
    area: float
    mean_dz: float
    # CloudCompare ReportInfoVol parity fields
    # (ref post_processing/cloudcompare_fun.py:139-147):
    matching_percent: float = 100.0     # % of observed cells seen by both
    avg_neighbors_per_cell: float = 0.0  # mean points/cell on common area


def dem_of_difference(dsm0: DSM, dsm1: DSM) -> tuple[np.ndarray,
                                                     VolumeReport]:
    """dz grid (dsm1 - dsm0) + volume report on the common valid area.

    Replaces cloudComPy ComputeVolume25D
    (post_processing/cloudcompare_fun.py:74-216). Grids must share the
    same extent/resolution (build both with explicit xlim/ylim)."""
    if dsm0.z.shape != dsm1.z.shape:
        raise ValueError("DSM grids must share shape; pass xlim/ylim")
    both = dsm0.mask & dsm1.mask
    dz = np.where(both, dsm1.z - dsm0.z, np.nan)
    cell = dsm0.res * dsm1.res
    add = float(np.nansum(np.where(dz > 0, dz, 0.0)) * cell)
    rem = float(-np.nansum(np.where(dz < 0, dz, 0.0)) * cell)
    area = float(both.sum() * cell)
    mean = float(np.nanmean(dz)) if both.any() else float("nan")
    match_pct, avg_nbr = 100.0, 0.0
    if dsm0.count is not None and dsm1.count is not None:
        obs0 = dsm0.count > 0
        obs1 = dsm1.count > 0
        obs_both = obs0 & obs1
        union = (obs0 | obs1).sum()
        match_pct = float(100.0 * obs_both.sum() / max(union, 1))
        if obs_both.any():
            avg_nbr = float(
                ((dsm0.count + dsm1.count)[obs_both] / 2.0).mean())
    return dz, VolumeReport(added=add, removed=rem, net=add - rem,
                            area=area, mean_dz=mean,
                            matching_percent=match_pct,
                            avg_neighbors_per_cell=avg_nbr)


def save_dsm_npz(dsm: DSM, path) -> None:
    np.savez_compressed(path, z=dsm.z, mask=dsm.mask, xx=dsm.xx,
                        yy=dsm.yy, res=dsm.res)


def save_dsm_geotiff(dsm: DSM, path, crs=None) -> bool:
    """GeoTIFF export when rasterio is available; returns success."""
    try:
        import rasterio
        from rasterio.transform import from_origin
    except ImportError:
        logger.warning("rasterio not available — use save_dsm_npz")
        return False
    tr = from_origin(dsm.xx[0] - dsm.res / 2, dsm.yy[-1] + dsm.res / 2,
                     dsm.res, dsm.res)
    with rasterio.open(
            path, "w", driver="GTiff", height=dsm.z.shape[0],
            width=dsm.z.shape[1], count=1, dtype="float32",
            transform=tr, crs=crs, nodata=np.nan) as dst:
        dst.write(np.flipud(dsm.z).astype(np.float32), 1)
    return True
