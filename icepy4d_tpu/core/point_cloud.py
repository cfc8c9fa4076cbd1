"""Point cloud container with JAX statistical-outlier-removal filter.

Replaces the reference's Open3D wrapper (core/point_cloud.py:36-187):
numpy storage + self-contained PLY IO + an on-device SOR filter
(k-NN mean distance thresholding) implemented with jnp — no open3d.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.io.ply import read_ply, write_ply


def _sor_mask(xyz: jax.Array, knn: int, std_ratio: float,
              block: int = 4096) -> jax.Array:
    """Statistical outlier removal mask via brute-force kNN on device.

    O(N^2) distances computed in ROW BLOCKS under lax.map: peak memory
    is (block, N) instead of (N, N), so dense clouds (millions of
    points) run without materializing terabyte matrices; the batched
    matmul inside each block still rides the MXU.
    """
    n = xyz.shape[0]
    k = min(knn, n - 1)
    pad = (-n) % block
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)))
    rows = xyz_p.reshape(-1, block, 3)
    row_idx = jnp.arange(n + pad).reshape(-1, block)
    sq_all = jnp.sum(xyz * xyz, axis=1)

    def block_mean_knn(args):
        pts, idx = args
        d2 = (jnp.sum(pts * pts, 1)[:, None] + sq_all[None, :]
              - 2.0 * (pts @ xyz.T))
        d2 = jnp.maximum(d2, 0.0)
        # mask self-distance (padded rows index past n and match nothing)
        d2 = jnp.where(idx[:, None] == jnp.arange(n)[None, :],
                       jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(jnp.sqrt(jnp.maximum(-neg_top, 0.0)), axis=1)

    mean_d = jax.lax.map(block_mean_knn, (rows, row_idx)).reshape(-1)[:n]
    mu = jnp.mean(mean_d)
    sigma = jnp.std(mean_d)
    return mean_d <= mu + std_ratio * sigma


class PointCloud:
    def __init__(
        self,
        points3d: np.ndarray | None = None,
        pcd_path: str | Path | None = None,
        points_col: np.ndarray | None = None,
    ):
        if pcd_path is not None:
            xyz, rgb = read_ply(pcd_path)
            self.points = xyz
            self.colors = (
                rgb.astype(np.float32) / 255.0 if rgb is not None else None
            )
        else:
            self.points = (
                np.asarray(points3d, np.float32).reshape(-1, 3)
                if points3d is not None
                else np.zeros((0, 3), np.float32)
            )
            if points_col is not None:
                c = np.asarray(points_col, np.float32).reshape(-1, 3)
                if c.max(initial=0.0) > 1.0:
                    c = c / 255.0
                self.colors = c
            else:
                self.colors = None

    def __len__(self) -> int:
        return self.points.shape[0]

    def get_points(self) -> np.ndarray:
        return self.points.copy()

    def get_colors(self, as_uint8: bool = True) -> np.ndarray | None:
        if self.colors is None:
            return None
        if as_uint8:
            return (self.colors * 255.0).astype(np.uint8)
        return self.colors.copy()

    def sor_filter(self, nb_neighbors: int = 10, std_ratio: float = 3.0):
        """Statistical outlier removal (ref core/point_cloud.py:136-161)."""
        if len(self) <= nb_neighbors:
            return self
        mask = np.asarray(
            jax.jit(_sor_mask, static_argnums=(1,))(
                jnp.asarray(self.points), int(nb_neighbors), float(std_ratio)
            )
        )
        self.points = self.points[mask]
        if self.colors is not None:
            self.colors = self.colors[mask]
        return self

    def write_ply(self, path) -> None:
        write_ply(path, self.points, self.colors)

    def write_las(self, path) -> None:
        """LAS export (ref core/point_cloud.py write_las); requires the
        optional laspy dependency."""
        try:
            import laspy
        except ImportError as e:
            raise ImportError(
                "laspy not available — use write_ply instead") from e
        header = laspy.LasHeader(point_format=2)
        las = laspy.LasData(header)
        las.x = self.points[:, 0]
        las.y = self.points[:, 1]
        las.z = self.points[:, 2]
        if self.colors is not None:
            c = (np.asarray(self.colors) * 65535).astype(np.uint16)
            las.red, las.green, las.blue = c[:, 0], c[:, 1], c[:, 2]
        las.write(str(path))

    # Reference name (core/point_cloud.py) — alias.
    save = write_ply
