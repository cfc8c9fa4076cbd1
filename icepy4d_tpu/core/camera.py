"""Pinhole camera as an immutable pytree with HOST-numpy state.

Re-designs the reference's `Camera` (core/camera.py:39-461): the same
state (K, OpenCV distortion, 4x4 world->camera extrinsics) and derived
quantities (pose, C, R, t, P, euler angles), as a `flax.struct`
dataclass so cameras vmap, jit, shard and stack natively. Mutating
updates (`update_K`, ...) return a new Camera.

The leaves are NUMPY arrays, not device arrays (r5 compile probe):
cameras are constructed and their derived properties read many times
per epoch on the HOST path — pipelines, exports, logging — and every
eager jnp op those paths ran cost a remote compile the first time plus
a ~0.1-1 s tunnel round trip per access. Host numpy makes them free;
jit converts the leaves at the call boundary exactly as before, and
batched device code (`parallel/`) stacks them into device arrays
itself.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from flax import struct

from icepy4d_tpu.ops import geometry as geom
from icepy4d_tpu.ops import geometry_np as geom_np

Array = jax.Array


@struct.dataclass
class Camera:
    K: np.ndarray  # (3, 3) intrinsics
    dist: np.ndarray  # (8,) OpenCV k1,k2,p1,p2,k3,k4,k5,k6 (zero-padded)
    extrinsics: np.ndarray  # (4, 4) world -> camera
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    # -- constructors ------------------------------------------------------
    @classmethod
    def create(
        cls,
        width: int = 0,
        height: int = 0,
        K: np.ndarray | Array | None = None,
        dist: np.ndarray | Array | None = None,
        extrinsics: np.ndarray | Array | None = None,
        calib_path: str | Path | None = None,
    ) -> "Camera":
        if calib_path is not None:
            from icepy4d_tpu.core.calibration import Calibration

            return Calibration(calib_path).to_camera()
        if K is None:
            # Rough default: focal = image width (ref camera.py default f).
            f = float(width) if width else 1.0
            K = np.array(
                [[f, 0.0, width / 2.0], [0.0, f, height / 2.0], [0, 0, 1]],
                np.float32,
            )
        K = np.asarray(K, np.float32).reshape(3, 3)
        if dist is None:
            dist = np.zeros((8,), np.float32)
        else:
            dist = geom_np.pad_distortion(np.asarray(dist, np.float32))
        if extrinsics is None:
            extrinsics = np.eye(4, dtype=np.float32)
        else:
            extrinsics = np.asarray(extrinsics, np.float32).reshape(4, 4)
        return cls(K=K, dist=dist, extrinsics=extrinsics,
                   width=int(width), height=int(height))

    # -- derived quantities (ref camera.py properties) ---------------------
    @property
    def R(self) -> np.ndarray:
        return np.asarray(self.extrinsics)[:3, :3]

    @property
    def t(self) -> np.ndarray:
        return np.asarray(self.extrinsics)[:3, 3]

    @property
    def pose(self) -> np.ndarray:
        """Camera -> world 4x4 (inverse of extrinsics)."""
        R = self.R
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R.T
        pose[:3, 3] = -R.T @ self.t
        return pose

    @property
    def C(self) -> np.ndarray:
        """Projection centre in world coords."""
        return -self.R.T @ self.t

    @property
    def P(self) -> np.ndarray:
        """3x4 projection matrix K [R | t]."""
        return np.asarray(self.K) @ np.asarray(self.extrinsics)[:3, :]

    @property
    def euler_angles(self) -> tuple[float, float, float]:
        """(omega, phi, kappa) of the camera-to-world rotation."""
        return tuple(np.asarray(a)
                     for a in geom_np.euler_from_matrix(self.R.T))

    # -- updates (immutable; ref update_K/update_dist/update_extrinsics) ---
    def update_K(self, K) -> "Camera":
        return self.replace(K=np.asarray(K, np.float32).reshape(3, 3))

    def update_dist(self, dist) -> "Camera":
        return self.replace(dist=geom_np.pad_distortion(dist))

    def update_extrinsics(self, extrinsics) -> "Camera":
        return self.replace(
            extrinsics=np.asarray(extrinsics, np.float32).reshape(4, 4)
        )

    def update_from_pose(self, pose) -> "Camera":
        return self.update_extrinsics(Camera.pose_to_extrinsics(pose))

    @staticmethod
    def pose_to_extrinsics(pose) -> np.ndarray:
        pose = np.asarray(pose, np.float32).reshape(4, 4)
        R = pose[:3, :3]
        C = pose[:3, 3]
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = R.T
        ext[:3, 3] = -R.T @ C
        return ext

    @staticmethod
    def extrinsics_to_pose(extrinsics) -> np.ndarray:
        return Camera.pose_to_extrinsics(extrinsics)  # involution

    @staticmethod
    def Rt_to_extrinsics(R, t) -> np.ndarray:
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(R, np.float32)
        ext[:3, 3] = np.asarray(t, np.float32).reshape(3)
        return ext

    # -- compute -----------------------------------------------------------
    def project_point(self, points_3d) -> np.ndarray:
        """World (N, 3) -> pixel (N, 2), full distortion model.

        Replaces cv2.Rodrigues + cv2.projectPoints (ref camera.py:332-360).
        Host numpy — per-epoch callers (trim residuals, target
        reprojection, exports) must not pay a tunnel round trip; the
        jit-side equivalent is ops/geometry.project_points.
        """
        pts = np.asarray(points_3d, np.float32).reshape(-1, 3)
        return geom_np.project_points(pts, self.K, self.extrinsics,
                                      self.dist)

    def undistort_points(self, points_2d) -> np.ndarray:
        pts = np.asarray(points_2d, np.float32).reshape(-1, 2)
        return geom_np.undistort_points(pts, self.K, self.dist)

    def factor_P(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decompose P into K, R, t via RQ (ref camera.py:362-380).

        Host-side utility — runs in float64 numpy for the precision a
        3x3 RQ of large-focal matrices needs.
        """
        P = np.asarray(self.P, np.float64)
        M = P[:, :3]
        # RQ decomposition through QR of the reversed/transposed matrix.
        Pm = np.flip(M, axis=0).T
        Q, R_ = np.linalg.qr(Pm)
        Rq = np.flip(np.flip(R_.T, axis=0), axis=1)
        Qq = np.flip(Q.T, axis=0)
        # Fix signs so diagonal of K is positive.
        s = np.sign(np.diag(Rq))
        K = Rq * s[None, :]
        R = Qq * s[:, None]
        t = np.linalg.solve(K, P[:, 3])
        K = K / K[2, 2]
        return K, R, t


# geom is still imported for callers that reach the device ops through
# this module's namespace (historical import path)
_ = geom
