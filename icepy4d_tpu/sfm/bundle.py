"""User-facing bundle adjustment — the native Metashape replacement.

The reference exports the icepy4d solution to Bundler format, runs
Agisoft Metashape (`MetashapeProject.run_full_workflow`,
metashape/metashape.py:355-380: optimizeCameras with marker/camera
accuracies), then reads refined cameras back (`MetashapeReader`,
:388-507). `BundleAdjustment` keeps those semantics in-process:

  ba = BundleAdjustment(cameras, features, points, targets_world=...,
                        camera_centers=..., cfg=BAConfig(...))
  result = ba.run()
  result.cameras   # refined Camera objects
  result.points    # refined (P, 3)

Weights mirror the reference's Metashape config defaults
(metashape/metashape.py:144-196 + config_2022.yaml 'metashape' block):
tie-point projection sigma 1 px, marker projection sigma 0.5 px, marker
location sigma 0.01 m (targets), camera center sigma per config.

For float32 conditioning the problem is internally re-centered on the
scene centroid (UTM-scale coordinates would otherwise eat the mantissa).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.ops.ba import (BAProblem, BAResult, lm_solve,
                                point_covariances)


@dataclass
class BAConfig:
    tie_point_sigma_px: float = 1.0      # Metashape tiepoint_accuracy
    marker_projection_sigma_px: float = 0.5  # marker_projection_accuracy
    marker_location_sigma_m: float = 0.01    # marker_location_accuracy
    camera_center_sigma_m: float = 0.0       # 0 = no center priors
    fix_cameras: list = field(default_factory=list)  # camera names
    free_intrinsics: tuple = ()  # indices in [fx,fy,cx,cy,k1,k2,p1,p2,...]
    fit_f: bool = False          # shortcut: free (fx, fy) like Metashape
    robust_delta: float | None = None  # Huber band (sigma); None = LS
    compute_covariance: bool = False   # Metashape tiepoint_covariance
    max_iters: int = 100
    # Degeneracy guard: Metashape simply refuses to optimize an
    # under-constrained chunk (ref metashape/metashape.py:195-196 —
    # optimizeCameras raises); we refuse too instead of applying a
    # diverged/NaN solution. Minimum tie points seen by >= 2 cameras:
    min_points: int = 10


@dataclass
class BAOutput:
    cameras: dict
    points: np.ndarray
    cost: float
    initial_cost: float
    iterations: int
    reprojection_rmse_px: float
    point_covariances: np.ndarray | None = None  # (P, 3, 3) when requested
    ok: bool = True              # False: guard fired, cameras/points are
    failure: str | None = None   # the UNCHANGED inputs (see BAConfig)


def _camera_to_theta(cam: Camera) -> np.ndarray:
    from icepy4d_tpu.ops.geometry_np import matrix_to_rodrigues as np_m2r

    R = np.asarray(cam.R)
    t = np.asarray(cam.t).reshape(3)
    rvec = np_m2r(R)
    return np.concatenate([rvec, t]).astype(np.float32)


def _theta_to_extrinsics(theta: np.ndarray) -> np.ndarray:
    from icepy4d_tpu.ops.geometry_np import rodrigues_to_matrix as np_r2m

    R = np_r2m(theta[:3])
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = theta[3:6]
    return E


def _camera_to_intr(cam: Camera) -> np.ndarray:
    K = np.asarray(cam.K)
    d = np.asarray(cam.dist).reshape(-1)
    return np.concatenate(
        [[K[0, 0], K[1, 1], K[0, 2], K[1, 2]], d]).astype(np.float32)


class BundleAdjustment:
    """Build and solve a BA problem from the framework's core objects.

    cameras: {name: Camera} with current (initial) extrinsics.
    image_points: {name: (N, 2) array} tie-point observations, aligned by
      row across cameras (row i = same 3D point, NaN = unseen).
    points3d: (N, 3) initial triangulated points.
    marker_image_points / marker_world: GCP observations + world coords
      (optional); camera_centers: {name: (3,)} world centers (optional).
    """

    def __init__(
        self,
        cameras: dict,
        image_points: dict,
        points3d: np.ndarray,
        marker_image_points: dict | None = None,
        marker_world: np.ndarray | None = None,
        camera_centers: dict | None = None,
        cfg: BAConfig | None = None,
    ):
        self.cfg = cfg or BAConfig()
        self.cam_names = list(cameras.keys())
        self.cameras = cameras
        self.image_points = image_points
        self.points3d = np.asarray(points3d, np.float32)
        self.marker_image_points = marker_image_points or {}
        self.marker_world = (
            None if marker_world is None
            else np.asarray(marker_world, np.float32))
        self.camera_centers = camera_centers or {}

    def _assemble(self):
        cfg = self.cfg
        names = self.cam_names
        c = len(names)
        n_tie = self.points3d.shape[0]
        n_mark = 0 if self.marker_world is None else len(self.marker_world)
        p = n_tie + n_mark

        obs_xy = np.zeros((p, c, 2), np.float32)
        obs_w = np.zeros((p, c), np.float32)
        for ci, name in enumerate(names):
            xy = np.asarray(self.image_points[name], np.float32)
            ok = np.isfinite(xy).all(axis=1)
            obs_xy[:n_tie, ci] = np.where(ok[:, None], xy, 0.0)
            obs_w[:n_tie, ci] = ok / cfg.tie_point_sigma_px
            mk = self.marker_image_points.get(name)
            if mk is not None and n_mark:
                mk = np.asarray(mk, np.float32)
                mok = np.isfinite(mk).all(axis=1)
                obs_xy[n_tie:, ci] = np.where(mok[:, None], mk, 0.0)
                obs_w[n_tie:, ci] = mok / cfg.marker_projection_sigma_px

        pt_prior = np.zeros((p, 3), np.float32)
        pt_prior_w = np.zeros((p,), np.float32)
        pts0 = self.points3d
        if n_mark:
            pt_prior[n_tie:] = self.marker_world
            pt_prior_w[n_tie:] = 1.0 / cfg.marker_location_sigma_m
            pts0 = np.concatenate([pts0, self.marker_world], axis=0)

        cam_prior = np.zeros((c, 3), np.float32)
        cam_prior_w = np.zeros((c,), np.float32)
        if cfg.camera_center_sigma_m > 0:
            for ci, name in enumerate(names):
                ctr = self.camera_centers.get(name)
                if ctr is not None:
                    cam_prior[ci] = np.asarray(ctr, np.float32).reshape(3)
                    cam_prior_w[ci] = 1.0 / cfg.camera_center_sigma_m

        cam_theta = np.stack(
            [_camera_to_theta(self.cameras[n]) for n in names])
        intr = np.stack([_camera_to_intr(self.cameras[n]) for n in names])
        cam_fixed = np.array(
            [n in cfg.fix_cameras for n in names], bool)

        # re-center for f32 conditioning: shift world so centroid = 0
        shift = pts0.mean(axis=0)
        pts0 = pts0 - shift
        pt_prior = pt_prior - shift  # weights of 0 make unused rows moot
        cam_prior = cam_prior - shift
        # extrinsics: t' = t + R @ shift
        from icepy4d_tpu.ops.geometry_np import rodrigues_to_matrix as np_r2m

        for ci in range(c):
            R = np_r2m(cam_theta[ci, :3])
            cam_theta[ci, 3:] = cam_theta[ci, 3:] + R @ shift

        # pow4 point-count bucket (ops/buckets.py): tie-point counts
        # vary per epoch, and an unpadded P re-specializes the whole LM
        # program — a fresh multi-second compile through a remote-TPU
        # tunnel EVERY epoch (pow2 buckets still straddled at real
        # counts, e.g. 1995 vs 2279). Padded rows carry zero
        # observation/prior weights (their V blocks stay invertible via
        # the LM damping floor) and all consumers slice [:n_tie].
        from icepy4d_tpu.ops.buckets import pad_bucket

        cap = pad_bucket(p, floor=256)
        if cap > p:
            pad = cap - p
            obs_xy = np.concatenate(
                [obs_xy, np.zeros((pad, c, 2), np.float32)])
            obs_w = np.concatenate([obs_w, np.zeros((pad, c), np.float32)])
            pt_prior = np.concatenate(
                [pt_prior, np.zeros((pad, 3), np.float32)])
            pt_prior_w = np.concatenate(
                [pt_prior_w, np.zeros(pad, np.float32)])
            pts0 = np.concatenate([pts0, np.zeros((pad, 3), np.float32)])

        prob = BAProblem(
            cam_theta=jnp.asarray(cam_theta),
            intrinsics=jnp.asarray(intr),
            points=jnp.asarray(pts0),
            obs_xy=jnp.asarray(obs_xy),
            obs_w=jnp.asarray(obs_w),
            pt_prior=jnp.asarray(pt_prior),
            pt_prior_w=jnp.asarray(pt_prior_w),
            cam_prior=jnp.asarray(cam_prior),
            cam_prior_w=jnp.asarray(cam_prior_w),
            cam_fixed=jnp.asarray(cam_fixed),
        )
        return prob, shift, n_tie

    def _failed(self, failure: str) -> BAOutput:
        return BAOutput(
            cameras=dict(self.cameras), points=self.points3d,
            cost=float("nan"), initial_cost=float("nan"), iterations=0,
            reprojection_rmse_px=float("nan"), ok=False, failure=failure)

    def run(self) -> BAOutput:
        cfg = self.cfg
        free_intr = tuple(cfg.free_intrinsics)
        if cfg.fit_f and not free_intr:
            free_intr = (0, 1)

        # degeneracy guard BEFORE solving: tie points with >= 2 finite
        # observations are the only ones that constrain the cameras
        n_multi = 0
        if self.points3d.shape[0]:
            seen = np.zeros(self.points3d.shape[0], np.int32)
            for name in self.cam_names:
                xy = np.asarray(self.image_points[name], np.float32)
                seen += np.isfinite(xy).all(axis=1)[: len(seen)]
            n_multi = int((seen >= 2).sum())
        if n_multi < cfg.min_points:
            return self._failed(
                f"only {n_multi} multi-view tie points "
                f"(min_points={cfg.min_points})")

        prob, shift, n_tie = self._assemble()
        res: BAResult = lm_solve(
            prob, free_intr=free_intr, max_iters=cfg.max_iters,
            robust_delta=cfg.robust_delta)

        from icepy4d_tpu.ops.geometry_np import (
            distort_normalized as np_distort,
            rodrigues_to_matrix as np_rodrigues,
        )

        cam_theta = np.asarray(res.cam_theta)
        intr = np.asarray(res.intrinsics)
        cameras = {}
        for ci, name in enumerate(self.cam_names):
            th = cam_theta[ci].copy()
            R = np_rodrigues(th[:3])
            th[3:] = th[3:] - R @ shift  # undo re-centering
            K = np.array([[intr[ci, 0], 0, intr[ci, 2]],
                          [0, intr[ci, 1], intr[ci, 3]],
                          [0, 0, 1]], np.float32)
            old = self.cameras[name]
            cameras[name] = Camera.create(
                width=old.width, height=old.height, K=K,
                dist=intr[ci, 4:], extrinsics=_theta_to_extrinsics(th))

        pts = np.asarray(res.points)[:n_tie] + shift

        # true pixel RMSE from actual residuals (res.cost is the Huber
        # objective when robust_delta is set, so it cannot be inverted
        # into an RMSE). Projected in the RE-CENTERED frame — UTM-scale
        # world coordinates would lose ~1 px to f32 cancellation.
        # Host numpy throughout: this runs after EVERY solve, and its
        # eager device ops used to cost ~8 remote op-compiles plus
        # per-epoch tunnel round trips (r5 compile probe).
        sq, n_obs = 0.0, 0
        pts_c = np.asarray(res.points)[:n_tie]
        obs_xy = np.asarray(prob.obs_xy)[:n_tie]
        obs_w = np.asarray(prob.obs_w)[:n_tie]
        for ci in range(len(self.cam_names)):
            ok = obs_w[:, ci] > 0
            if not ok.any():
                continue
            th = cam_theta[ci]  # still re-centered
            R = np_rodrigues(th[:3])
            Xc = pts_c[ok] @ R.T + th[3:6]
            xn = Xc[:, :2] / Xc[:, 2:]
            xd = np_distort(xn, intr[ci, 4:12])  # N_INTR=12: 8 dist terms
            proj = xd * intr[ci, :2] + intr[ci, 2:4]
            r = proj - obs_xy[:, ci][ok]
            sq += float((r ** 2).sum())
            n_obs += int(ok.sum())
        rmse = float(np.sqrt(sq / max(n_obs, 1)))

        # finite-check AFTER solving: a diverged LM (NaN/inf anywhere in
        # the solution) must never overwrite the input cameras
        finite = (np.isfinite(rmse)
                  and np.isfinite(cam_theta).all()
                  and np.isfinite(intr).all()
                  and np.isfinite(pts).all())
        if not finite:
            return self._failed(
                f"non-finite solution after {int(res.iterations)} iters "
                f"(rmse={rmse})")

        covs = None
        if cfg.compute_covariance:
            # translation-invariant: the re-centered frame is fine
            covs = np.asarray(point_covariances(
                prob, res.cam_theta, res.intrinsics, res.points,
                free_intr=free_intr,
                robust_delta=self.cfg.robust_delta))[:n_tie]
        return BAOutput(
            cameras=cameras,
            points=pts,
            cost=float(res.cost),
            initial_cost=float(res.initial_cost),
            iterations=int(res.iterations),
            reprojection_rmse_px=rmse,
            point_covariances=covs,
        )
