"""Glaciology analysis products: borders, sections, voxels, volumes.

TPU-native replacement for the reference's CloudCompare/open3d-backed
analysis scripts (the layer users actually run on season outputs):

- geometric features + border detection
  (ref scripts/pcd_postprocessing/extract_section.py:59-135 — CloudCompare
  ``cc.computeFeature(Linearity/Verticality)`` + percentile SF filters):
  here a brute-force kNN runs as row-blocked matmuls on the MXU and the
  3x3 neighborhood covariances are batch-eigendecomposed on device.
- glacier border time series (ref extract_section.py:140-196).
- cross sections + section plots (ref scripts/plot_sections.py:1-91).
- voxelization (ref scripts/pcd_postprocessing/voxelization.py:20-55 —
  open3d VoxelGrid): device scatter-binning into a static grid.
- volume variation workflow (ref scripts/pcd_postprocessing/
  volume_variations.py:40-214 — cloudComPy ComputeVolume25D + pandas
  post-processing): native DEM-of-difference along any axis, the
  reference's CSV schema, daily/normalized/cumulative series + plots.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.utils.logger import get_logger

logger = get_logger()

_AXIS = {"x": 0, "y": 1, "z": 2}


# -- geometric features (linearity / planarity / verticality) ----------------


@partial(jax.jit, static_argnames=("k", "block"))
def _knn_indices(xyz: jax.Array, k: int, block: int = 2048) -> jax.Array:
    """(N, k) indices of the k nearest neighbors (self included).

    Row-blocked brute force: each block computes a (block, N) distance
    matrix via one matmul (MXU) + top_k; peak memory stays O(block*N)
    (same pattern as core/point_cloud.py::_sor_mask).
    """
    n = xyz.shape[0]
    pad = (-n) % block
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)))
    rows = xyz_p.reshape(-1, block, 3)
    row_idx = jnp.arange(n + pad).reshape(-1, block)
    sq_all = jnp.sum(xyz * xyz, axis=1)

    def block_knn(args):
        pts, idx = args
        d2 = (jnp.sum(pts * pts, 1)[:, None] + sq_all[None, :]
              - 2.0 * (pts @ xyz.T))
        d2 = jnp.where(idx[:, None] >= n, 0.0, d2)  # padded rows benign
        _, nbr = jax.lax.top_k(-d2, k)
        return nbr

    return jax.lax.map(block_knn, (rows, row_idx)).reshape(-1, k)[:n]


@partial(jax.jit, static_argnames=("k",))
def _features_from_knn(xyz: jax.Array, nbr: jax.Array, k: int) -> dict:
    nb = xyz[nbr]                                    # (N, k, 3)
    mu = nb.mean(axis=1, keepdims=True)
    d = nb - mu
    cov = jnp.einsum("nki,nkj->nij", d, d) / k       # (N, 3, 3)
    evals, evecs = jnp.linalg.eigh(cov)              # ascending
    l3, l2, l1 = evals[:, 0], evals[:, 1], evals[:, 2]
    eps = 1e-12
    linearity = (l1 - l2) / (l1 + eps)
    planarity = (l2 - l3) / (l1 + eps)
    sphericity = l3 / (l1 + eps)
    normal = evecs[:, :, 0]                          # smallest eigval
    # CloudCompare's Verticality = 1 - |n_z| (1 = vertical surface)
    verticality = 1.0 - jnp.abs(normal[:, 2])
    return {"linearity": linearity, "planarity": planarity,
            "sphericity": sphericity, "verticality": verticality,
            "normal": normal}


def geometric_features(points: np.ndarray, k: int = 32,
                       block: int = 2048) -> dict:
    """Per-point covariance features of the k-NN neighborhood.

    Native equivalent of CloudCompare ``cc.computeFeature`` as used by
    ref extract_section.py:84-96 (Linearity, Verticality; radius
    neighborhoods approximated by kNN). Returns numpy arrays keyed
    linearity/planarity/sphericity/verticality/normal.
    """
    xyz = jnp.asarray(np.asarray(points, np.float32))
    k = min(k, xyz.shape[0])
    nbr = _knn_indices(xyz, k, min(block, xyz.shape[0]))
    out = _features_from_knn(xyz, nbr, k)
    return {kk: np.asarray(v) for kk, v in out.items()}


def detect_border(
    points: np.ndarray,
    k: int = 32,
    linearity_percentile: tuple = (95, 100),
    verticality_percentile: tuple = (95, 100),
    z_percentile: tuple = (60, 95),
) -> np.ndarray:
    """Boolean mask of glacier top-border candidate points.

    Reproduces the filter chain of ref extract_section.py:99-135:
    keep the top-linearity percentile band, then the top-verticality
    band within it, then a z-percentile band (the border sits below the
    very top of the vertical face).
    """
    points = np.asarray(points, np.float32)
    f = geometric_features(points, k=k)
    mask = np.ones(len(points), bool)

    for key, band in (("linearity", linearity_percentile),
                      ("verticality", verticality_percentile)):
        vals = np.where(mask, f[key], np.nan)
        lo = np.nanpercentile(vals, band[0])
        hi = np.nanpercentile(vals, band[1])
        mask &= (f[key] >= lo) & (f[key] <= hi)

    z = np.where(mask, points[:, 2], np.nan)
    lo = np.nanpercentile(z, z_percentile[0])
    hi = np.nanpercentile(z, z_percentile[1])
    mask &= (points[:, 2] >= lo) & (points[:, 2] <= hi)
    return mask


def border_statistics(
    border_points: np.ndarray,
    y_lims: tuple | None = None,
    x_halfwidth: float | None = 10.0,
) -> dict:
    """Center-of-border stats row (ref extract_section.py:140-196):
    optional y band filter, keep points within ±x_halfwidth of the
    median x, then mean/median/std per axis."""
    pts = np.asarray(border_points, np.float64)
    if y_lims is not None:
        pts = pts[(pts[:, 1] >= y_lims[0]) & (pts[:, 1] <= y_lims[1])]
    if x_halfwidth is not None and len(pts):
        med_x = np.median(pts[:, 0])
        pts = pts[np.abs(pts[:, 0] - med_x) <= x_halfwidth]
    if not len(pts):
        nan = float("nan")
        return {f"{a}_{s}": nan for a in "xyz"
                for s in ("mean", "median", "std")}
    row = {}
    for i, a in enumerate("xyz"):
        row[f"{a}_mean"] = float(pts[:, i].mean())
        row[f"{a}_median"] = float(np.median(pts[:, i]))
        row[f"{a}_std"] = float(pts[:, i].std())
    return row


def write_border_time_series(rows: list, path) -> Path:
    """CSV in the reference's top_border_coords.txt schema
    (ref extract_section.py:147-150): one row per (pcd_name, date)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write("pcd_name,date,x_mean,x_median,x_std,"
                "y_mean,y_median,y_std,z_mean,z_median,z_std\n")
        for name, date, st in rows:
            f.write(f"{name},{date},"
                    f"{st['x_mean']:.3f},{st['x_median']:.3f},"
                    f"{st['x_std']:.3f},{st['y_mean']:.3f},"
                    f"{st['y_median']:.3f},{st['y_std']:.3f},"
                    f"{st['z_mean']:.3f},{st['z_median']:.3f},"
                    f"{st['z_std']:.3f}\n")
    return path


# -- cross sections ----------------------------------------------------------


def extract_section(points: np.ndarray, axis: str, station: float,
                    thickness: float = 1.0,
                    colors: np.ndarray | None = None):
    """Points within ±thickness/2 of `station` along `axis` (a planar
    slab — the native form of the reference's section extraction,
    ref extract_section.py:199-207 + scripts/plot_sections.py)."""
    pts = np.asarray(points)
    a = _AXIS[axis]
    m = np.abs(pts[:, a] - station) <= thickness / 2.0
    if colors is not None:
        return pts[m], np.asarray(colors)[m]
    return pts[m]


def extract_sections(points: np.ndarray, axis: str, stations,
                     thickness: float = 1.0) -> dict:
    """{station: (M, 3) section} for a list of stations."""
    return {float(s): extract_section(points, axis, float(s), thickness)
            for s in stations}


def set_axes_equal(ax) -> None:
    """Equal-scale 3D axes (ref scripts/plot_sections.py:38-62)."""
    limits = np.array([ax.get_xlim3d(), ax.get_ylim3d(),
                       ax.get_zlim3d()])
    origin = np.mean(limits, axis=1)
    radius = 0.5 * np.max(np.abs(limits[:, 1] - limits[:, 0]))
    x, y, z = origin
    ax.set_xlim3d([x - radius, x + radius])
    ax.set_ylim3d([y - radius, y + radius])
    ax.set_zlim3d([z - radius, z + radius])


def plot_sections(sections: dict, elev: float = 0.0, azim: float = -90.0,
                  out: str | Path | None = None):
    """Orthographic 3D scatter of named sections, XZ view by default
    (ref scripts/plot_sections.py:65-91). Headless: returns the figure,
    saves to `out` when given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection="3d")
    for name, cloud in sections.items():
        cloud = np.asarray(cloud)
        if not len(cloud):
            continue
        ax.scatter(cloud[:, 0], cloud[:, 1], cloud[:, 2],
                   label=str(name), s=5, alpha=0.7)
    ax.set_xlabel("X", fontsize=12)
    ax.set_ylabel("Y", fontsize=12)
    ax.set_zlabel("Z", fontsize=12)
    ax.legend(prop={"size": 12}, markerscale=4)
    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect([1, 1, 1])
    ax.set_proj_type("ortho")
    set_axes_equal(ax)
    ax.grid(True, linestyle="--", alpha=0.5)
    fig.tight_layout()
    if out is not None:
        fig.savefig(out, dpi=200)
    return fig


# -- voxelization ------------------------------------------------------------


@dataclass
class VoxelGrid:
    centers: np.ndarray      # (M, 3) filled-voxel centers
    colors: np.ndarray       # (M, 3) mean color per voxel (0..1)
    counts: np.ndarray       # (M,) points per voxel
    indices: np.ndarray      # (M, 3) int grid indices
    voxel_size: float
    origin: np.ndarray       # (3,) = bb_min


@partial(jax.jit, static_argnames=("shape",))
def _voxel_bin(pts: jax.Array, cols: jax.Array, origin: jax.Array,
               voxel_size: float, shape: tuple):
    nx, ny, nz = shape
    idx = jnp.floor((pts - origin) / voxel_size).astype(jnp.int32)
    ok = ((idx >= 0).all(axis=1)
          & (idx < jnp.asarray([nx, ny, nz])).all(axis=1)
          & jnp.isfinite(pts).all(axis=1))
    lin = jnp.where(ok, (idx[:, 0] * ny + idx[:, 1]) * nz + idx[:, 2],
                    nx * ny * nz)
    size = nx * ny * nz + 1
    cnt = jnp.zeros((size,)).at[lin].add(ok.astype(jnp.float32))
    csum = jnp.zeros((size, 3)).at[lin].add(
        jnp.where(ok[:, None], cols, 0.0))
    return cnt[:-1], csum[:-1]


def voxelize(points: np.ndarray, colors: np.ndarray | None = None,
             voxel_size: float = 0.2, bb_min=None, bb_max=None
             ) -> VoxelGrid:
    """Scatter-bin a cloud into a static voxel grid on device.

    Native replacement for open3d
    ``VoxelGrid.create_from_point_cloud_within_bounds``
    (ref voxelization.py:33-39): one jitted scatter-add per cloud;
    filled voxels + mean colors come back compacted.
    """
    pts = np.asarray(points, np.float32)
    if colors is None:
        colors = np.zeros_like(pts)
    cols = np.asarray(colors, np.float32)
    if cols.max() > 1.0:
        cols = cols / 255.0
    finite = pts[np.isfinite(pts).all(axis=1)]
    if bb_min is None:
        bb_min = np.floor(finite.min(axis=0))
    if bb_max is None:
        bb_max = np.ceil(finite.max(axis=0))
    bb_min = np.asarray(bb_min, np.float32)
    bb_max = np.asarray(bb_max, np.float32)
    shape = tuple(int(max(np.ceil((bb_max[i] - bb_min[i]) / voxel_size), 1))
                  for i in range(3))
    cnt, csum = _voxel_bin(jnp.asarray(pts), jnp.asarray(cols),
                           jnp.asarray(bb_min), float(voxel_size), shape)
    cnt = np.asarray(cnt)
    csum = np.asarray(csum)
    filled = np.nonzero(cnt > 0)[0]
    nx, ny, nz = shape
    ii = filled // (ny * nz)
    jj = (filled // nz) % ny
    kk = filled % nz
    indices = np.stack([ii, jj, kk], axis=1).astype(np.int32)
    centers = bb_min + (indices + 0.5) * voxel_size
    mean_cols = csum[filled] / cnt[filled][:, None]
    return VoxelGrid(centers=centers.astype(np.float32),
                     colors=mean_cols.astype(np.float32),
                     counts=cnt[filled].astype(np.int32),
                     indices=indices, voxel_size=float(voxel_size),
                     origin=bb_min)


def write_voxel_centers(grid: VoxelGrid, path) -> Path:
    """x,y,z,r,g,b rows for filled voxels (ref voxelization.py:48-55)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for c, col in zip(grid.centers, grid.colors):
            f.write(f"{c[0]:.4f},{c[1]:.4f},{c[2]:.4f},"
                    f"{col[0]:.4f},{col[1]:.4f},{col[2]:.4f}\n")
    return path


_CUBE_V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
                   np.float32)
_CUBE_F = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                    [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                    [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]],
                   np.int64)


def voxel_mesh(grid: VoxelGrid) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """Cube mesh of the filled voxels (verts, faces, vert_colors) —
    the native form of ref voxelization.py:150-163's vox_mesh loop,
    vectorized (one broadcast instead of per-voxel TriangleMesh)."""
    m = len(grid.centers)
    base = grid.origin + grid.indices * grid.voxel_size
    verts = (base[:, None, :] + _CUBE_V[None] * grid.voxel_size
             ).reshape(m * 8, 3)
    faces = (_CUBE_F[None] + (np.arange(m) * 8)[:, None, None]
             ).reshape(m * 12, 3)
    vcols = np.repeat(grid.colors, 8, axis=0)
    return verts.astype(np.float32), faces, vcols.astype(np.float32)


# -- volume variations workflow ----------------------------------------------


def find_closest_date_idx(dates: list, target: datetime) -> int:
    return int(np.argmin([abs((d - target).total_seconds())
                          for d in dates]))


def make_pairs(pcd_list: list, step: int = 1,
               date_format: str = "%Y_%m_%d") -> tuple[dict, list]:
    """Pair every cloud with the one closest to `step` days later
    (ref post_processing/utils.py::make_pairs:18-33; same return
    shape: ({i: (path0, path1)}, dates)). Deviation: the reference
    iterates ``range(len - step)``, silently assuming one cloud per
    day; here the window is date-based, so seasons with gaps or
    multi-day spacing pair correctly."""
    import re

    pcd_list = [Path(p) for p in pcd_list]
    m = re.search(r"\d{4}", pcd_list[0].stem)
    if m is None:
        raise ValueError(f"no date found in {pcd_list[0].stem}")
    idx = m.start()
    dates = [datetime.strptime(p.stem[idx:], date_format)
             for p in pcd_list]
    pair_dict = {}
    dt = timedelta(step)
    for i in range(len(pcd_list)):
        target = dates[i] + dt
        if target > max(dates):
            break
        j = find_closest_date_idx(dates, target)
        pair_dict[i] = (str(pcd_list[i]), str(pcd_list[j]))
    return pair_dict, dates


def volume_variations(
    pcd_paths: list,
    t_step: int = 5,
    grid_step: float = 0.3,
    direction: str = "x",
    out_dir=None,
    base_name: str = "sampled",
    date_format: str = "%Y_%m_%d",
    make_plots: bool = True,
):
    """The full volume-variation workflow of ref volume_variations.py:
    pair clouds `t_step` days apart, DEM-of-difference each pair along
    `direction`, write the reference's CSV schema, derive daily /
    surface-normalized / cumulative series, and save the two plots.
    Returns the pandas DataFrame.
    """
    import pandas as pd

    from icepy4d_tpu.post_processing.point_clouds import DemOfDifference

    pairs, _dates = make_pairs(pcd_paths, t_step, date_format)
    rows = []
    for i, (p0, p1) in pairs.items():
        dod = DemOfDifference(p0, p1, dsm_step=grid_step,
                              direction=direction)
        rep = dod.compute_volume()
        rows.append({
            "pcd0": Path(p0).stem, "pcd1": Path(p1).stem,
            "volume": rep.net, "addedVolume": rep.added,
            "removedVolume": rep.removed, "surface": rep.area,
            "matchingPercent": rep.matching_percent,
            "averageNeighborsPerCell": rep.avg_neighbors_per_cell,
        })
        logger.info("DOD %s -> %s: net %.2f m3 (%.1f%% match)",
                    Path(p0).stem, Path(p1).stem, rep.net,
                    rep.matching_percent)
    df = pd.DataFrame(rows)
    if not len(df):
        return df

    # post-processing identical to ref volume_variations.py:138-168
    max_match = df["matchingPercent"].max()
    df["date_in"] = pd.to_datetime(
        df["pcd0"].str.replace(f"{base_name}_", "", regex=False),
        format=date_format)
    df.sort_values(by="date_in", inplace=True)
    df["date_fin"] = pd.to_datetime(
        df["pcd1"].str.replace(f"{base_name}_", "", regex=False),
        format=date_format)
    df["dt"] = (df.date_fin - df.date_in) / np.timedelta64(1, "D")
    df["volume_daily"] = df["volume"] / df["dt"].replace(0, np.nan)
    df["volume_daily_normalized"] = (
        df["volume_daily"] / df["matchingPercent"] * max_match)
    df["volume_daily_cumul"] = df["volume_daily"].cumsum()
    df["volume_daily_norm_cumul"] = df["volume_daily_normalized"].cumsum()

    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        fout = (f"{base_name}_dir{direction.upper()}_tstep{t_step}"
                f"_grid{grid_step}")
        cols = ["pcd0", "pcd1", "volume", "addedVolume", "removedVolume",
                "surface", "matchingPercent", "averageNeighborsPerCell"]
        df[cols].to_csv(out_dir / f"{fout}.csv", index=False,
                        header=False)
        df.to_csv(out_dir / f"{fout}_proc.csv", index=False)
        if make_plots:
            _volume_plots(df, out_dir, fout, t_step)
    return df


def _volume_plots(df, out_dir: Path, fout: str, t_step: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for col, title, suffix in (
        ("volume_daily_normalized",
         f"Daily volume differences - Step {t_step} days",
         "daily_diff_norm"),
        ("volume_daily_norm_cumul",
         f"Cumulated volume difference - Step {t_step} days",
         "daily_diff_norm_cumulated"),
    ):
        fig, ax = plt.subplots()
        fig.set_layout_engine("tight")
        ax.plot(df["date_in"], -df[col])
        ax.set_xlabel("day")
        ax.set_ylabel("-dV [$m^3$]")
        ax.set_title(title)
        ax.grid(True)
        ax.minorticks_on()
        fig.autofmt_xdate()
        fig.savefig(out_dir / f"{fout}_{suffix}.png", dpi=200)
        plt.close(fig)
