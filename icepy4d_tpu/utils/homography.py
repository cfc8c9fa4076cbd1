"""Homography warping for camera stabilization (DIC preprocessing).

Ref utils/homography.py:10-51 + the pipeline's smoothing loop
(main_dev.py:434-493): re-base a camera's imagery onto a reference
orientation assuming pure rotation (H = K0 R K1^-1), with per-epoch
Euler angles optionally median-smoothed over a +-k epoch window so the
warped sequence is temporally stable.

The warp itself is the device kernel ops.image.warp_homography; this
module supplies the pose algebra and the season-level driver.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.ops.image import warp_homography
from icepy4d_tpu.ops.transforms import euler_from_matrix, euler_matrix

logger = logging.getLogger("icepy4d_tpu")


def homography_from_cameras(cam_ref, cam) -> np.ndarray:
    """H mapping cam's image onto cam_ref's orientation (rotation-only
    model, ref utils/homography.py:10-51): H = K_ref R_rel K^-1."""
    R_rel = np.asarray(cam_ref.R) @ np.asarray(cam.R).T
    H = np.asarray(cam_ref.K) @ R_rel @ np.linalg.inv(np.asarray(cam.K))
    return H / H[2, 2]


def warp_image_to_reference(image, cam, cam_ref) -> np.ndarray:
    """Warp `image` (taken by cam) to cam_ref's orientation."""
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    # H maps cam pixels -> ref pixels; warp_homography uses cv2 semantics
    # (H: src -> dst, samples source at H^-1 @ dst)
    H = jnp.asarray(homography_from_cameras(cam_ref, cam), jnp.float32)
    h, w = image.shape[:2]
    out = warp_homography(img, H, h, w)
    return np.asarray(out)


def smooth_euler_angles(angles: np.ndarray, window: int = 2) -> np.ndarray:
    """Median-smooth per-epoch Euler angle triplets over +-window epochs
    (ref main_dev.py:452-481)."""
    angles = np.asarray(angles, np.float64)
    out = np.empty_like(angles)
    n = len(angles)
    for i in range(n):
        lo, hi = max(0, i - window), min(n, i + window + 1)
        out[i] = np.median(angles[lo:hi], axis=0)
    return out


def homography_warping(
    epoches,
    camera_to_warp: str,
    reference_epoch: int = 0,
    smooth_window: int = 2,
    out_dir=None,
) -> dict[int, np.ndarray]:
    """Season-level driver (ref main_dev.py:434-493): warp every epoch's
    `camera_to_warp` image onto the reference epoch's orientation, with
    median-smoothed per-epoch rotations. Returns {epoch_id: warped}."""
    from pathlib import Path

    eids = sorted(epoches._epochs.keys())
    cams = [epoches[e].cameras[camera_to_warp] for e in eids]
    # angles of the world-to-camera R itself (ref main_dev.py:470:
    # euler_from_matrix(cameras[cam].R)) — NOT Camera.euler_angles,
    # which describes R.T and would write a transposed matrix back
    angles = np.stack([
        np.array([float(np.asarray(a)) for a in
                  euler_from_matrix(jnp.asarray(c.R))])
        for c in cams])
    sm = smooth_euler_angles(angles, window=smooth_window)

    ref_cam = epoches[reference_epoch].cameras[camera_to_warp]
    out = {}
    for i, eid in enumerate(eids):
        cam = cams[i]
        R_s = np.asarray(euler_matrix(*[jnp.asarray(a) for a in sm[i]]))
        E = np.asarray(cam.extrinsics).copy()
        E[:3, :3] = R_s
        cam_s = cam.update_extrinsics(E)
        img = epoches[eid].images[camera_to_warp].value
        warped = warp_image_to_reference(img, cam_s, ref_cam)
        out[eid] = warped
        if out_dir is not None:
            import cv2

            p = Path(out_dir)
            p.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(p / f"warped_{eid:03d}.jpg"),
                        np.clip(warped[..., ::-1] * 255, 0,
                                255).astype(np.uint8)
                        if warped.ndim == 3 else
                        np.clip(warped * 255, 0, 255).astype(np.uint8))
    logger.info("homography-warped %d epochs of %s", len(out),
                camera_to_warp)
    return out
