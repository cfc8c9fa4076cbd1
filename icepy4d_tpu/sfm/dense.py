"""Dense stereo facade — the Metashape buildDenseCloud replacement.

PlaneSweepStereo takes two calibrated Camera objects + images, handles
undistortion and optional downscale (Metashape's `dense_downscale`,
metashape/metashape.py:214-222), runs the streaming plane sweep
(ops/dense.py) and filters/unprojects to a colored world point cloud.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.ops.dense import depth_to_points, plane_sweep
from icepy4d_tpu.ops.geometry import scale_intrinsics
from icepy4d_tpu.ops.image import rgb_to_gray, resize, undistort_image

logger = logging.getLogger("icepy4d_tpu")


class PlaneSweepStereo:
    """Dense two-view reconstruction.

    cameras: [reference Camera, secondary Camera] with world extrinsics.
    images: matching [img0, img1] (H, W[, 3]) uint8/float.
    depth range: in the REFERENCE camera frame (meters).
    """

    def __init__(
        self,
        cameras: list[Camera],
        images: list[np.ndarray],
        depth_min: float,
        depth_max: float,
        n_planes: int = 96,
        window: int = 7,
        downscale: int = 1,
        cost_threshold: float = 0.5,
        uniqueness_threshold: float = 0.98,
    ) -> None:
        self.cameras = list(cameras)
        self.images = list(images)
        self.depth_min = float(depth_min)
        self.depth_max = float(depth_max)
        self.n_planes = int(n_planes)
        self.window = int(window)
        self.downscale = int(downscale)
        self.cost_threshold = float(cost_threshold)
        self.uniqueness_threshold = float(uniqueness_threshold)
        self.depth: np.ndarray | None = None
        self.valid: np.ndarray | None = None

    def _prep(self, cam: Camera, img: np.ndarray):
        g = jnp.asarray(img)
        if g.dtype == jnp.uint8:
            g = g.astype(jnp.float32) / 255.0
        if g.ndim == 3:
            rgb = g
            g = rgb_to_gray(g)
        else:
            rgb = None
        g = undistort_image(g, cam.K, cam.dist)
        K = np.asarray(cam.K)
        if self.downscale > 1:
            s = 1.0 / self.downscale
            h, w = g.shape
            g = resize(g, (int(h * s), int(w * s)))
            if rgb is not None:
                rgb = resize(rgb, (int(h * s), int(w * s)))
            K = np.asarray(scale_intrinsics(jnp.asarray(K), s))
        return g, rgb, jnp.asarray(K)

    def run(self) -> dict:
        cam0, cam1 = self.cameras
        g0, rgb0, K0 = self._prep(cam0, self.images[0])
        g1, _, K1 = self._prep(cam1, self.images[1])
        out = plane_sweep(
            g0, g1, K0, K1,
            jnp.asarray(cam0.extrinsics), jnp.asarray(cam1.extrinsics),
            self.depth_min, self.depth_max,
            n_planes=self.n_planes, window=self.window,
        )
        valid = (
            np.asarray(out["inbounds"])
            & (np.asarray(out["cost"]) < self.cost_threshold)
            & (np.asarray(out["uniqueness"]) < self.uniqueness_threshold)
        )
        self.depth = np.asarray(out["depth"])
        self.cost = np.asarray(out["cost"])
        self.valid = valid
        self._K0 = K0
        self._rgb0 = rgb0
        logger.info("plane sweep: %.1f%% valid pixels",
                    100.0 * valid.mean())
        return {"depth": self.depth, "cost": self.cost, "valid": valid}

    def to_point_cloud(self):
        """Unproject valid depths to world points (+ colors if RGB)."""
        assert self.depth is not None, "run() first"
        cam0 = self.cameras[0]
        pts, _ = depth_to_points(
            jnp.asarray(self.depth), self._K0,
            jnp.asarray(cam0.extrinsics))
        pts = np.asarray(pts)
        m = self.valid.reshape(-1)
        colors = None
        if self._rgb0 is not None:
            colors = np.asarray(self._rgb0).reshape(-1, 3)[m]
        return pts[m], colors
