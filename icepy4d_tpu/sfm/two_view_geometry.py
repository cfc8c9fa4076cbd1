"""Relative orientation of a stereo pair (ref sfm/two_view_geometry.py:38-197).

Same contract as the reference's RelativeOrientation: estimate the pose
of camera 1 relative to camera 0 from matched keypoints, optionally scale
by a world baseline, and chain onto camera 0's world pose. The essential
matrix search runs as hypothesis-parallel RANSAC on device.
"""

from __future__ import annotations

import logging

import numpy as np

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.sfm.geometry import estimate_pose

logger = logging.getLogger("icepy4d_tpu")


class RelativeOrientation:
    def __init__(self, cameras: list[Camera], features: list[np.ndarray]) -> None:
        """cameras: [cam0, cam1] Camera pytrees (cam0 extrinsics required);
        features: [kpts0 (n, 2), kpts1 (n, 2)] matched pixel coords."""
        self.cameras = list(cameras)
        self.features = features

    def estimate_pose(
        self,
        threshold: float = 1.0,
        confidence: float = 0.9999,
        scale_factor: float | None = None,
        scores: np.ndarray | None = None,
        F_hint: np.ndarray | None = None,
    ) -> np.ndarray:
        """Estimate relative pose, update cameras[1] in place (list slot).

        Mirrors ref two_view_geometry.py:52-116: R, t map cam0-frame
        coords to cam1-frame; cam1 world pose = cam0.pose @ relpose.
        Returns the inlier mask over the input matches.
        """
        assert self.cameras[0].extrinsics is not None, (
            "Camera 0 extrinsics required before relative orientation"
        )
        out = estimate_pose(
            self.features[0],
            self.features[1],
            np.asarray(self.cameras[0].K),
            np.asarray(self.cameras[1].K),
            thresh=threshold,
            conf=confidence,
            scores=scores,
            F_hint=F_hint,
        )
        if out is None:
            raise ValueError("Not enough correspondences (<5) for relative pose")
        R, t, valid = out
        logger.info(
            "Relative Orientation - valid points: %d/%d", valid.sum(), len(valid)
        )
        if scale_factor is not None:
            t = t * scale_factor
        else:
            logger.warning("No scale factor provided; model up to scale.")

        cam1 = self.cameras[1].update_extrinsics(Camera.Rt_to_extrinsics(R, t))
        # Chain onto camera 0's world pose (ref :100-105).
        cam2_to_world = np.asarray(self.cameras[0].pose) @ np.asarray(cam1.pose)
        cam1 = cam1.update_extrinsics(Camera.pose_to_extrinsics(cam2_to_world))
        self.cameras[1] = cam1
        return valid

    def get_scale_factor_from_baseline(self, baseline_world: float) -> float:
        """World baseline / model baseline (ref :118-132)."""
        baseline = float(
            np.linalg.norm(
                np.asarray(self.cameras[0].C) - np.asarray(self.cameras[1].C)
            )
        )
        return baseline_world / baseline
