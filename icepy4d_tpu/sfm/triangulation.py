"""Two-view / n-view triangulation driver (ref sfm/triangulation.py:42-183).

Same contract as the reference's Triangulate class, but the per-point
Python loop over Hartley–Sturm iterations (the hot loop flagged in
SURVEY §3.1) becomes one vmapped kernel; color interpolation is a
batched bilinear gather.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.ops import geometry as geom
from icepy4d_tpu.ops import triangulation as tri

logger = logging.getLogger("icepy4d_tpu")


from functools import partial

import jax


@jax.jit
def _undistort_and_triangulate(p0, p1, K0, d0, K1, d1, P0, P1, n):
    """Fused undistort + iterative-LS triangulation + valid fraction.

    `n` is a TRACED scalar (the true, unpadded count): the program
    compiles once per pow4 bucket, not once per exact count."""
    p0u = geom.undistort_points(jnp.asarray(p0), K0, d0)
    p1u = geom.undistort_points(jnp.asarray(p1), K1, d1)
    pts3d, status = tri.iterative_ls_triangulation(p0u, p1u, P0, P1)
    real = jnp.arange(p0.shape[0]) < n
    frac = (jnp.sum(status.astype(jnp.float32) * real)
            / jnp.maximum(n, 1).astype(jnp.float32))
    return pts3d, frac


class Triangulate:
    def __init__(
        self,
        cameras: list[Camera] | None = None,
        image_points: list[np.ndarray] | None = None,
    ) -> None:
        self.cameras = cameras
        self.image_points = image_points
        self.points3d: np.ndarray | None = None
        self.colors: np.ndarray | None = None

    def triangulate_two_views(
        self,
        views_ids: list[int] = [0, 1],
        approach: str = "iterative_LS_triangulation",
        compute_colors: bool = False,
        image: np.ndarray | None = None,
        cam_id: int = 0,
    ) -> np.ndarray:
        """Undistort both observation sets, triangulate, optional colors.

        Matches ref triangulation.py:63-120 (undistort with P=K, then
        iterative LS on P = K[R|t]).
        """
        cam0 = self.cameras[views_ids[0]]
        cam1 = self.cameras[views_ids[1]]
        p0 = np.asarray(self.image_points[views_ids[0]], np.float32)
        p1 = np.asarray(self.image_points[views_ids[1]], np.float32)
        n = len(p0)
        # pow4 padding keeps jit caches stable across varying match
        # counts — including across epochs (ops/buckets.py)
        from icepy4d_tpu.ops.buckets import pad_bucket

        # floor 64 (not 8): aligns this program's bucket ladder with
        # the season's other geometry programs (64, 256, 1024, 4096) so
        # real tie-point counts land in ONE shared bucket instead of
        # straddling the old 2048/8192 rungs across epochs
        cap = pad_bucket(n, floor=64)
        pad0 = np.zeros((cap, 2), np.float32)
        pad1 = np.zeros((cap, 2), np.float32)
        pad0[:n] = p0
        pad1[:n] = p1

        if approach == "iterative_LS_triangulation":
            # ONE fused program for undistort x2 + triangulation +
            # status fraction (r5 compile probe: the unfused chain was
            # 5 remote dispatches — and 5 op compiles per shape bucket)
            pts3d, frac = _undistort_and_triangulate(
                pad0, pad1, cam0.K, cam0.dist, cam1.K, cam1.dist,
                cam0.P, cam1.P, n)
            logger.info("Point triangulation succeeded: %.3f",
                        float(frac) if n else 0.0)
        elif approach == "linear_triangulation":
            pts0u = geom.undistort_points(
                jnp.asarray(pad0), cam0.K, cam0.dist)
            pts1u = geom.undistort_points(
                jnp.asarray(pad1), cam1.K, cam1.dist)
            pts3d = tri.linear_eigen_triangulation(pts0u, pts1u, cam0.P, cam1.P)
        else:
            raise ValueError(f"Unknown triangulation approach {approach!r}")

        self.points3d = np.asarray(pts3d)[:n]
        if compute_colors:
            assert image is not None, "image required for color interpolation"
            self.interpolate_colors_from_image(image, self.cameras[cam_id])
        return self.points3d

    def triangulate_nviews(self) -> np.ndarray:
        """N-view DLT over all cameras (ref triangulation.py:122-137).

        Point counts pad to a pow4 bucket (CLAUDE.md convention: ragged
        shapes recompile the jitted DLT every epoch)."""
        from icepy4d_tpu.ops.buckets import pad_bucket

        Ps = jnp.stack([cam.P for cam in self.cameras])
        us_np = [np.asarray(p, np.float32)[..., :2]
                 for p in self.image_points]
        n = us_np[0].shape[0]
        # floor 64 (not 8): aligns this program's bucket ladder with
        # the season's other geometry programs (64, 256, 1024, 4096) so
        # real tie-point counts land in ONE shared bucket instead of
        # straddling the old 2048/8192 rungs across epochs
        cap = pad_bucket(n, floor=64)
        v = len(us_np)
        us = np.zeros((v, cap, 2), np.float32)
        for i, u in enumerate(us_np):
            us[i, :n] = u
        mask = np.zeros((v, cap), bool)
        mask[:, :n] = True
        pts = tri.triangulate_nview(jnp.asarray(us), Ps,
                                    jnp.asarray(mask))
        self.points3d = np.asarray(pts)[:n]
        return self.points3d

    def interpolate_colors_from_image(
        self, image: np.ndarray, camera: Camera,
        convert_BRG2RGB: bool = False
    ) -> np.ndarray:
        """Project points into `image` and bilinearly sample colors in [0, 1]
        (ref sfm/interpolate_colors.py:54-88).

        convert_BRG2RGB defaults to False: this repo's Image loader
        (core/images.py::read_image) already decodes RGB via PIL —
        flipping would swap R/B in the point cloud. Pass True only for
        cv2-decoded BGR arrays."""
        assert self.points3d is not None, "triangulate first"
        img = np.asarray(image)
        if convert_BRG2RGB and img.ndim == 3 and img.shape[2] == 3:
            img = img[..., ::-1]
        uv = geom.project_points(
            jnp.asarray(self.points3d, jnp.float32),
            camera.K,
            camera.extrinsics,
            camera.dist,
        )
        cols = tri.interpolate_bilinear(
            jnp.asarray(img, jnp.float32) / 255.0, uv
        )
        self.colors = np.asarray(jnp.clip(cols, 0.0, 1.0))
        logger.info("Point colors interpolated")
        return self.colors
