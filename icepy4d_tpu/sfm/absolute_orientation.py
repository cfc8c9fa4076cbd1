"""Absolute orientation (georeferencing) + space resection
(ref sfm/absolute_orientation.py:18-287).

AbsoluteOrientation estimates the 7-parameter Helmert similarity mapping
the photogrammetric model onto surveyed world coordinates: linear
Umeyama/Procrustes estimate (replacing Gohlke affine_matrix_from_points,
ref thirdparty/transformations.py:908) with an optional on-device
Gauss-Newton refinement (replacing lmfit LM, ref :181-242).
SpaceResection recovers one camera's pose from GCPs via hypothesis-
parallel PnP RANSAC (replacing cv2.solvePnPRansac, ref :18-50).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.ops import ransac as ransac_ops
from icepy4d_tpu.ops import transforms as tf

logger = logging.getLogger("icepy4d_tpu")


class SpaceResection:
    """Single-camera pose from 3D-2D correspondences (ref :18-50)."""

    def __init__(self, camera: Camera) -> None:
        self.camera = camera

    def estimate(
        self,
        image_points: np.ndarray,
        object_points: np.ndarray,
        reprojection_error: float = 3.0,
        seed: int = 0,
    ) -> Camera:
        p2 = np.asarray(image_points, np.float32).reshape(-1, 2)
        p3 = np.asarray(object_points, np.float32).reshape(-1, 3)
        n = p2.shape[0]
        # pow4 bucket (CLAUDE.md convention): GCP counts vary per epoch
        # and each distinct shape would recompile the jitted RANSAC
        from icepy4d_tpu.ops.buckets import pad_bucket

        cap = pad_bucket(n, floor=8)
        pts2d_np = np.zeros((cap, 2), np.float32)
        pts3d_np = np.zeros((cap, 3), np.float32)
        pts2d_np[:n] = p2
        pts3d_np[:n] = p3
        # PnP expects undistorted observations; remove lens distortion first.
        pts2d_np[:n] = np.asarray(
            self.camera.undistort_points(p2), np.float32)
        pts2d = jnp.asarray(pts2d_np)
        pts3d = jnp.asarray(pts3d_np)
        mask = jnp.asarray(np.arange(cap) < n)
        R, t, inliers = ransac_ops.ransac_pnp(
            jax.random.PRNGKey(seed),
            pts3d,
            pts2d,
            self.camera.K,
            mask,
            threshold_px=float(reprojection_error),
        )
        n_inl = int(np.asarray(inliers).sum())
        if n_inl < 4:
            logger.warning("Space resection failed: %d inliers", n_inl)
            return self.camera
        logger.info(
            "Space resection succeeded. Inliers: %d/%d", n_inl, pts2d.shape[0]
        )
        self.camera = self.camera.update_extrinsics(
            Camera.Rt_to_extrinsics(R, t)
        )
        return self.camera


class AbsoluteOrientation:
    def __init__(
        self,
        cameras: tuple[Camera, ...],
        points3d_final: np.ndarray,
        points3d_orig: np.ndarray | None = None,
        image_points: tuple[np.ndarray, ...] | None = None,
        camera_centers_world: tuple[np.ndarray, ...] | None = None,
    ) -> None:
        """v0 = model coords (triangulated), v1 = world coords; optionally
        append the camera centres as extra correspondences (ref :120-129)."""
        self.cameras = list(cameras)
        if points3d_final is None or points3d_final.shape[1] != 3:
            raise ValueError("points3d_final must be (n, 3) world coordinates")
        self.v1 = np.asarray(points3d_final, np.float64)
        if points3d_orig is not None:
            self.v0 = np.asarray(points3d_orig, np.float64)
        elif image_points is not None:
            self.v0 = self.triangulate_image_points(image_points)
        else:
            raise ValueError("provide points3d_orig or image_points")
        self.tform: np.ndarray | None = None
        if camera_centers_world is not None:
            self.add_camera_centers_to_points(camera_centers_world)

    def add_camera_centers_to_points(self, camera_centers_world) -> None:
        """Append each camera's model-frame centre to v0 and its surveyed
        world coordinates to v1 (ref :108-140)."""
        centers_model = [
            np.asarray(cam.C, np.float64).reshape(1, 3) for cam in self.cameras
        ]
        self.v0 = np.concatenate([self.v0, *centers_model])
        self.v1 = np.concatenate(
            [self.v1]
            + [np.asarray(c, np.float64).reshape(1, 3) for c in camera_centers_world]
        )

    def triangulate_image_points(self, image_points) -> np.ndarray:
        from icepy4d_tpu.sfm.triangulation import Triangulate

        t = Triangulate(self.cameras, list(image_points))
        return np.asarray(t.triangulate_two_views(), np.float64)

    def _centered(self):
        """float64 centroids + centered copies: surveyed coordinates are
        UTM-scale (~5e6 m), where float32 ULP is ~0.5 m — the f32 device
        kernels must only ever see centroid-relative values."""
        c0 = self.v0.mean(axis=0)
        c1 = self.v1.mean(axis=0)
        return c0, c1, self.v0 - c0, self.v1 - c1

    @staticmethod
    def _uncenter(Tc: np.ndarray, c0, c1) -> np.ndarray:
        """Centered-frame similarity -> full transform, composed in
        float64: T = Trans(c1) @ Tc @ Trans(-c0)."""
        T = np.eye(4)
        M = np.asarray(Tc[:3, :3], np.float64)
        T[:3, :3] = M
        T[:3, 3] = c1 + np.asarray(Tc[:3, 3], np.float64) - M @ c0
        return T

    def estimate_transformation_linear(
        self, estimate_scale: bool = True
    ) -> np.ndarray:
        """Umeyama SVD similarity v1 ≈ T v0 (ref :141-152)."""
        c0, c1, v0c, v1c = self._centered()
        from icepy4d_tpu.ops.geometry_np import similarity_from_points

        Tc = np.asarray(similarity_from_points(
            v0c, v1c, with_scale=estimate_scale), np.float64)
        self.tform = self._uncenter(Tc, c0, c1)
        return self.tform

    def estimate_transformation_least_squares(
        self, uncertainty: np.ndarray | None = None
    ) -> np.ndarray:
        """GN refinement of the 7 Helmert params, weighted by 1/uncertainty
        (replaces the reference's lmfit minimize, ref :181-242)."""
        if self.tform is None:
            self.estimate_transformation_linear()
        weights = None
        if uncertainty is not None:
            weights = jnp.asarray(1.0 / np.asarray(uncertainty), jnp.float32)
        c0, c1, v0c, v1c = self._centered()
        # express the current estimate in the centered frames
        M = np.asarray(self.tform[:3, :3], np.float64)
        Tc0 = np.eye(4)
        Tc0[:3, :3] = M
        Tc0[:3, 3] = np.asarray(self.tform[:3, 3], np.float64) - c1 + M @ c0
        Tc = np.asarray(tf.refine_similarity_gauss_newton(
            jnp.asarray(Tc0, jnp.float32),
            jnp.asarray(v0c, jnp.float32),
            jnp.asarray(v1c, jnp.float32),
            weights=weights,
        ), np.float64)
        self.tform = self._uncenter(Tc, c0, c1)
        return self.tform

    def extract_params_from_T(self, T: np.ndarray | None = None) -> dict:
        """T -> dict(rx, ry, rz, tx, ty, tz, m) (ref :155-180)."""
        if T is None:
            T = self.tform
        M = np.asarray(T[:3, :3], np.float64)
        m = float(np.cbrt(np.linalg.det(M)))
        from icepy4d_tpu.ops.geometry_np import euler_from_matrix

        ax, ay, az = (float(a) for a in euler_from_matrix(M / m))
        return {
            "rx": ax, "ry": ay, "rz": az,
            "tx": float(T[0, 3]), "ty": float(T[1, 3]), "tz": float(T[2, 3]),
            "m": m,
        }

    def apply_transformation(
        self,
        T: np.ndarray | None = None,
        points3d: np.ndarray | None = None,
        camera: Camera | None = None,
    ) -> np.ndarray:
        """Transform points and re-base all camera poses (ref :244-287)."""
        if T is None:
            T = self.tform
        if points3d is None:
            points3d = self.v1
        # host float64: the translation is world-scale, f32 would
        # quantize every output point by up to ~0.5 m
        T64 = np.asarray(T, np.float64)
        pts = np.asarray(points3d, np.float64) @ T64[:3, :3].T + T64[:3, 3]
        self.v1 = pts

        def rebase(cam: Camera) -> Camera:
            pose = np.asarray(T, np.float64) @ np.asarray(cam.pose, np.float64)
            # Remove the scale from the rotation block so extrinsics stay rigid.
            s = np.cbrt(np.linalg.det(pose[:3, :3]))
            pose[:3, :3] = pose[:3, :3] / s
            return cam.update_extrinsics(Camera.pose_to_extrinsics(pose))

        if camera is None:
            self.cameras = [rebase(c) for c in self.cameras]
        else:
            return rebase(camera)
        return self.v1


# Reference-spelling aliases (ref sfm/__init__.py:2-4).
Absolute_orientation = AbsoluteOrientation
Space_resection = SpaceResection


def pose_from_known_center(
    camera: Camera,
    center: np.ndarray,
    image_points: np.ndarray,
    object_points: np.ndarray,
) -> Camera:
    """Camera pose from >= 2 GCP bearings when the camera CENTER is
    surveyed (the standard fixed-monitoring-station setup: config
    georef.camera_centers_world + per-epoch targets).

    With C known only the 3-DOF rotation remains: undistorted GCP
    observations give bearing vectors in the camera frame, the world
    directions (X - C) give them in the world frame, and the rotation
    is the Kabsch/Procrustes alignment of the two bundles — exact for
    2+ non-collinear GCPs, least-squares for more. Far more robust than
    PnP minimal solvers on the 3-4 clustered GCPs a glacier site
    typically has (cf ref do_space_resection, main_dev.py + cv2
    solvePnPRansac, sfm/absolute_orientation.py:18-50).
    """
    center = np.asarray(center, np.float64).reshape(3)
    p2 = np.asarray(image_points, np.float64).reshape(-1, 2)
    X = np.asarray(object_points, np.float64).reshape(-1, 3)
    und = np.asarray(camera.undistort_points(
        np.asarray(p2, np.float32)), np.float64).reshape(-1, 2)
    K = np.asarray(camera.K, np.float64)
    xn = (und - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    b_cam = np.concatenate([xn, np.ones((len(xn), 1))], axis=1)
    b_cam /= np.linalg.norm(b_cam, axis=1, keepdims=True)
    b_w = X - center
    b_w /= np.linalg.norm(b_w, axis=1, keepdims=True)
    # R minimizing sum ||b_cam - R b_w||^2 (world -> camera)
    M = b_cam.T @ b_w
    U, _s, Vt = np.linalg.svd(M)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = -R @ center
    return Camera.create(width=camera.width, height=camera.height,
                         K=np.asarray(camera.K),
                         dist=np.asarray(camera.dist),
                         extrinsics=E.astype(np.float32))
