"""Bundle adjustment tests: synthetic ground-truth recovery.

(The reference delegates BA to the closed-source Metashape engine and has
no BA tests; this suite validates our native replacement.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from icepy4d_tpu.ops.ba import BAProblem, lm_solve
from icepy4d_tpu.ops.transforms import rodrigues_to_matrix


def _make_scene(n_cams=3, n_pts=120, seed=0, noise_px=0.0):
    rng = np.random.default_rng(seed)
    fx = fy = 1200.0
    cx, cy = 640.0, 480.0
    intr = np.tile(np.array(
        [fx, fy, cx, cy] + [0.0] * 8, np.float32), (n_cams, 1))

    # cameras on an arc looking at the origin-ish scene
    cam_theta = []
    for i in range(n_cams):
        # vary all rotation axes and ty: axis-aligned rigs leave gauge
        # freedoms (e.g. fy vs point-Y scaling) that a real rig doesn't
        rvec = np.array([0.04 * i, 0.05 * i, 0.02 * i], np.float32)
        tvec = np.array([-1.0 * i, 0.3 * i, 6.0 + 0.2 * i], np.float32)
        cam_theta.append(np.concatenate([rvec, tvec]))
    cam_theta = np.stack(cam_theta).astype(np.float32)

    pts = rng.uniform([-3, -2, -1], [3, 2, 1], (n_pts, 3)).astype(np.float32)

    obs = np.zeros((n_pts, n_cams, 2), np.float32)
    for c in range(n_cams):
        R = np.asarray(rodrigues_to_matrix(jnp.asarray(cam_theta[c, :3])))
        t = cam_theta[c, 3:]
        pc = pts @ R.T + t
        xy = pc[:, :2] / pc[:, 2:]
        obs[:, c] = xy * [fx, fy] + [cx, cy]
    obs += rng.normal(0, noise_px, obs.shape).astype(np.float32)
    return cam_theta, intr, pts, obs


def _problem(cam_theta, intr, pts, obs, **over):
    n_pts, n_cams = obs.shape[:2]
    kw = dict(
        cam_theta=jnp.asarray(cam_theta),
        intrinsics=jnp.asarray(intr),
        points=jnp.asarray(pts),
        obs_xy=jnp.asarray(obs),
        obs_w=jnp.ones((n_pts, n_cams), jnp.float32),
        pt_prior=jnp.zeros((n_pts, 3), jnp.float32),
        pt_prior_w=jnp.zeros((n_pts,), jnp.float32),
        cam_prior=jnp.zeros((n_cams, 3), jnp.float32),
        cam_prior_w=jnp.zeros((n_cams,), jnp.float32),
        cam_fixed=jnp.zeros((n_cams,), bool),
    )
    kw.update(over)
    return BAProblem(**kw)


def _rmse_px(res, prob):
    from icepy4d_tpu.ops.ba import _project_resid

    import jax

    r = jax.vmap(
        lambda X, xyc, wc: jax.vmap(
            _project_resid, in_axes=(0, None, 0, 0, 0, None)
        )(res.cam_theta, X, res.intrinsics, xyc, wc, ())
    )(res.points, prob.obs_xy, prob.obs_w)
    r = np.asarray(r)
    return float(np.sqrt((r ** 2).sum(-1).mean()))


def test_ba_recovers_perturbed_scene():
    cam_theta, intr, pts, obs = _make_scene()
    rng = np.random.default_rng(1)
    pts_noisy = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    cams_noisy = cam_theta.copy()
    cams_noisy[1:, :3] += rng.normal(0, 0.01, (2, 3)).astype(np.float32)
    cams_noisy[1:, 3:] += rng.normal(0, 0.05, (2, 3)).astype(np.float32)

    prob = _problem(
        cams_noisy, intr, pts_noisy, obs,
        cam_fixed=jnp.asarray([True, False, False]),  # gauge: fix cam0
        # one more gauge DoF (global scale): pin one point lightly
        pt_prior=jnp.asarray(pts),
        pt_prior_w=jnp.asarray([10.0] + [0.0] * (len(pts) - 1),
                               jnp.float32),
    )
    res = lm_solve(prob, max_iters=60)
    assert float(res.cost) < float(res.initial_cost) * 1e-4
    assert _rmse_px(res, prob) < 0.02


def test_ba_with_noise_reaches_noise_floor():
    cam_theta, intr, pts, obs = _make_scene(noise_px=0.5)
    rng = np.random.default_rng(2)
    pts_noisy = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    prob = _problem(
        cam_theta, intr, pts_noisy, obs,
        cam_fixed=jnp.asarray([True, True, False]),
    )
    res = lm_solve(prob, max_iters=60)
    rmse = _rmse_px(res, prob)
    assert 0.3 < rmse < 0.8  # ~= injected 0.5 px noise


def test_ba_camera_center_priors_constrain_gauge():
    cam_theta, intr, pts, obs = _make_scene(n_cams=2)
    centers = []
    for c in range(2):
        R = np.asarray(rodrigues_to_matrix(jnp.asarray(cam_theta[c, :3])))
        centers.append(-R.T @ cam_theta[c, 3:])
    centers = np.stack(centers).astype(np.float32)

    rng = np.random.default_rng(3)
    cams_noisy = cam_theta.copy()
    cams_noisy[:, 3:] += rng.normal(0, 0.05, (2, 3)).astype(np.float32)
    pts_noisy = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)

    prob = _problem(
        cams_noisy, intr, pts_noisy, obs,
        cam_prior=jnp.asarray(centers),
        cam_prior_w=jnp.full((2,), 100.0, jnp.float32),
        pt_prior=jnp.asarray(pts),
        pt_prior_w=jnp.asarray([50.0, 50.0, 50.0] + [0.0] * (len(pts) - 3),
                               jnp.float32),
    )
    res = lm_solve(prob, max_iters=80)
    # camera centers must return to their priors
    for c in range(2):
        R = np.asarray(rodrigues_to_matrix(res.cam_theta[c, :3]))
        ctr = -R.T @ np.asarray(res.cam_theta[c, 3:])
        np.testing.assert_allclose(ctr, centers[c], atol=5e-3)
    assert _rmse_px(res, prob) < 0.05


def test_ba_refines_focal_length():
    cam_theta, intr, pts, obs = _make_scene()
    intr_wrong = intr.copy()
    intr_wrong[:, 0] *= 1.02  # 2% focal error
    intr_wrong[:, 1] *= 1.02
    prob = _problem(
        cam_theta, intr_wrong, pts, obs,
        cam_fixed=jnp.ones((3,), bool),  # poses known exactly
    )
    res = lm_solve(prob, free_intr=(0, 1), max_iters=60)
    np.testing.assert_allclose(
        np.asarray(res.intrinsics[:, :2]), intr[:, :2], rtol=2e-4)
    assert _rmse_px(res, prob) < 0.05


def test_ba_ignores_invalid_observations():
    cam_theta, intr, pts, obs = _make_scene()
    obs_bad = obs.copy()
    obs_bad[10:20, 1] = 1e6  # corrupt, but weight them out
    w = np.ones(obs.shape[:2], np.float32)
    w[10:20, 1] = 0.0
    prob = _problem(
        cam_theta, intr, pts, obs_bad,
        obs_w=jnp.asarray(w),
        cam_fixed=jnp.asarray([True, True, False]),
    )
    res = lm_solve(prob, max_iters=40)
    assert float(res.cost) < 1e-4


# ---------------------------------------------------------------------------
# user-facing BundleAdjustment (Metashape-workflow replacement)
# ---------------------------------------------------------------------------

def test_bundle_adjustment_class_stereo_with_markers(calib_file):
    from icepy4d_tpu.core import Calibration
    from icepy4d_tpu.sfm import BAConfig, BundleAdjustment

    cam = Calibration(calib_file).to_camera()
    K = np.asarray(cam.K)
    rng = np.random.default_rng(5)

    # ground truth: stereo rig in a UTM-like (large-offset) frame
    base = np.array([4.0e5, 5.0e6, 1800.0], np.float32)
    centers = np.stack([base, base + [30.0, 5.0, 1.0]]).astype(np.float32)
    look = np.array([0.0, 1.0, 0.0])

    def make_extr(ctr, yaw):
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        # camera looks along +y: build R mapping world->cam
        A = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
        R = A @ Rwc
        t = -R @ ctr
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = t
        return E

    extr = [make_extr(centers[0], 0.0), make_extr(centers[1], -0.05)]
    pts = (base + rng.uniform([-40, 120, -30], [40, 220, 30],
                              (150, 3))).astype(np.float32)
    markers = (base + np.array(
        [[-30, 150, -20], [25, 180, 10], [0, 200, 25], [-10, 130, 5]],
        np.float32)).astype(np.float32)

    from icepy4d_tpu.core.camera import Camera

    def project(E, X):
        Xc = X @ E[:3, :3].T + E[:3, 3]
        xy = Xc[:, :2] / Xc[:, 2:]
        return xy * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    cams_true = {
        "cam1": Camera.create(K=K, extrinsics=extr[0]),
        "cam2": Camera.create(K=K, extrinsics=extr[1]),
    }
    obs = {n: project(np.asarray(c.extrinsics), pts) +
           rng.normal(0, 0.3, (len(pts), 2))
           for n, c in cams_true.items()}
    mobs = {n: project(np.asarray(c.extrinsics), markers)
            for n, c in cams_true.items()}

    # perturb initial cameras + points (as after relative orientation)
    cams_init = {}
    for i, (n, c) in enumerate(cams_true.items()):
        E = np.asarray(c.extrinsics).copy()
        E[:3, 3] += rng.normal(0, 0.5, 3)
        cams_init[n] = Camera.create(K=K, extrinsics=E)
    pts_init = pts + rng.normal(0, 0.5, pts.shape).astype(np.float32)

    ba = BundleAdjustment(
        cams_init, obs, pts_init,
        marker_image_points=mobs, marker_world=markers,
        camera_centers={"cam1": centers[0], "cam2": centers[1]},
        cfg=BAConfig(camera_center_sigma_m=0.1, max_iters=100),
    )
    out = ba.run()
    assert out.cost < out.initial_cost
    assert out.reprojection_rmse_px < 0.6  # ~noise floor (0.3 px injected)
    # camera centers recovered in the huge-offset frame
    for n, ctr in zip(("cam1", "cam2"), centers):
        np.testing.assert_allclose(
            np.asarray(out.cameras[n].C).ravel(), ctr, atol=0.2)
    # points land near ground truth
    err = np.linalg.norm(out.points - pts, axis=1)
    assert np.median(err) < 0.25


def test_lm_solve_batched_season():
    """A whole 'season' of BA problems as ONE vmapped LM program."""
    import jax

    from icepy4d_tpu.ops.ba import lm_solve_batched

    probs = []
    for seed in range(4):
        cam_theta, intr, pts, obs = _make_scene(seed=seed, noise_px=0.2)
        rng = np.random.default_rng(seed + 10)
        pts_noisy = pts + rng.normal(0, 0.04, pts.shape).astype(np.float32)
        probs.append(_problem(
            cam_theta, intr, pts_noisy, obs,
            cam_fixed=jnp.asarray([True, True, False])))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    res = lm_solve_batched(batched, max_iters=40)
    assert res.cost.shape == (4,)
    for i in range(4):
        assert float(res.cost[i]) < float(res.initial_cost[i])
    # every epoch reaches its ~0.2 px noise floor
    single = [_rmse_px(jax.tree.map(lambda a: a[i], res), probs[i])
              for i in range(4)]
    assert max(single) < 0.4


def test_ba_huber_downweights_outliers():
    cam_theta, intr, pts, obs = _make_scene(noise_px=0.2)
    rng = np.random.default_rng(7)
    obs_bad = obs.copy()
    n_out = 15
    obs_bad[:n_out, 2] += rng.uniform(30, 80, (n_out, 2))  # gross outliers
    pts_noisy = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    prob = _problem(cam_theta, intr, pts_noisy, obs_bad,
                    cam_fixed=jnp.asarray([True, True, False]))

    res_ls = lm_solve(prob, max_iters=60)
    res_hb = lm_solve(prob, max_iters=60, robust_delta=2.0)

    err_ls = np.linalg.norm(np.asarray(res_ls.points) - pts, axis=1)
    err_hb = np.linalg.norm(np.asarray(res_hb.points) - pts, axis=1)
    # the corrupted points get dragged by pure LS but not by Huber
    assert np.median(err_hb[:n_out]) < np.median(err_ls[:n_out]) * 0.5
    # inlier points stay accurate under Huber
    assert np.median(err_hb[n_out:]) < 0.02


def test_point_covariances_match_empirical_error():
    """Predicted covariances must track the actual estimation error:
    the Mahalanobis distance of (estimate - truth) should be ~chi2(3)."""
    import jax

    from icepy4d_tpu.ops.ba import point_covariances

    cam_theta, intr, pts, obs = _make_scene(n_pts=200, noise_px=1.0)
    rng = np.random.default_rng(11)
    pts_noisy = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    prob = _problem(cam_theta, intr, pts_noisy, obs,
                    cam_fixed=jnp.ones((3,), bool))
    res = lm_solve(prob, max_iters=60)
    cov = np.asarray(point_covariances(
        prob, res.cam_theta, res.intrinsics, res.points))
    assert cov.shape == (200, 3, 3)
    # symmetric positive definite
    np.testing.assert_allclose(cov, cov.transpose(0, 2, 1), atol=1e-8)
    assert (np.linalg.eigvalsh(cov) > 0).all()
    err = np.asarray(res.points) - pts
    m2 = np.einsum("pi,pij,pj->p", err, np.linalg.inv(cov), err)
    # E[chi2_3] = 3; allow generous slack for the single draw
    assert 1.0 < m2.mean() < 9.0
    # more observations (all 3 cams) must beat fewer: scale check vs a
    # 1-extra-sigma scenario — covariance grows with weaker weights
    w2 = np.ones(obs.shape[:2], np.float32) * 0.5   # sigma doubled
    prob2 = _problem(cam_theta, intr, pts_noisy, obs,
                     obs_w=jnp.asarray(w2),
                     cam_fixed=jnp.ones((3,), bool))
    cov2 = np.asarray(point_covariances(
        prob2, res.cam_theta, res.intrinsics, res.points))
    ratio = np.trace(cov2, axis1=1, axis2=2) / np.trace(cov, axis1=1,
                                                        axis2=2)
    np.testing.assert_allclose(ratio, 4.0, rtol=0.05)


def test_masked_observation_near_principal_plane_stays_finite():
    """Review finding: a point near a NON-observing camera's principal
    plane overflowed the distortion polynomial; 0-weight * inf = NaN
    poisoned every normal-equation build."""
    cam_theta, intr, pts, obs = _make_scene(n_cams=3, n_pts=40, seed=2,
                                            noise_px=0.3)
    import numpy as np

    # place one point essentially IN camera 2's principal plane
    from icepy4d_tpu.ops.ba import lm_solve
    from icepy4d_tpu.ops.transforms import rodrigues_to_matrix

    R = np.asarray(rodrigues_to_matrix(jnp.asarray(cam_theta[2, :3])))
    t = np.asarray(cam_theta[2, 3:6])
    C = -R.T @ t
    z_dir = R[2]                       # camera 2's viewing axis (world)
    pts = np.asarray(pts).copy()
    pts[0] = C + 1e-7 * z_dir          # Xc[2] ~ 1e-7 for camera 2
    w = np.ones(obs.shape[:2], np.float32)
    w[0, 2] = 0.0                      # camera 2 does NOT observe it

    prob = _problem(cam_theta, intr, pts, obs,
                    obs_w=jnp.asarray(w))
    res = lm_solve(prob, max_iters=10)
    assert np.isfinite(float(res.cost))
    assert np.isfinite(np.asarray(res.points)).all()


def test_ba_refuses_degenerate_problem(calib_file):
    """A 1-point epoch must NOT be solved: guard fires, cameras and
    points come back unchanged, ok=False (Metashape semantics — it
    refuses an under-constrained chunk, ref metashape.py:195-196)."""
    from icepy4d_tpu.core import Calibration
    from icepy4d_tpu.core.camera import Camera
    from icepy4d_tpu.sfm import BAConfig, BundleAdjustment

    cam = Calibration(calib_file).to_camera()
    K = np.asarray(cam.K)
    E1 = np.eye(4, dtype=np.float32)
    E2 = np.eye(4, dtype=np.float32)
    E2[:3, 3] = [-30.0, 0, 0]
    cams = {"cam1": Camera.create(K=K, extrinsics=E1),
            "cam2": Camera.create(K=K, extrinsics=E2)}
    pts = np.array([[0.0, 0.0, 100.0]], np.float32)
    obs = {"cam1": np.array([[3000.0, 2000.0]], np.float32),
           "cam2": np.array([[3100.0, 2000.0]], np.float32)}

    ba = BundleAdjustment(cams, obs, pts, cfg=BAConfig())
    out = ba.run()
    assert not out.ok
    assert "multi-view tie points" in out.failure
    assert out.iterations == 0
    # unchanged inputs returned verbatim
    assert out.cameras["cam1"] is cams["cam1"]
    np.testing.assert_array_equal(out.points, pts)
    assert np.isnan(out.reprojection_rmse_px)


def test_ba_min_points_counts_multiview_only(calib_file):
    """Points seen by a single camera don't constrain anything — the
    guard must count >=2-view points, not rows."""
    from icepy4d_tpu.core import Calibration
    from icepy4d_tpu.core.camera import Camera
    from icepy4d_tpu.sfm import BAConfig, BundleAdjustment

    cam = Calibration(calib_file).to_camera()
    K = np.asarray(cam.K)
    cams = {"cam1": Camera.create(K=K, extrinsics=np.eye(4, dtype=np.float32)),
            "cam2": Camera.create(K=K, extrinsics=np.eye(4, dtype=np.float32))}
    n = 40
    pts = np.zeros((n, 3), np.float32) + [0, 0, 100]
    rng = np.random.default_rng(0)
    obs1 = rng.uniform(100, 500, (n, 2)).astype(np.float32)
    obs2 = np.full((n, 2), np.nan, np.float32)  # cam2 sees nothing
    ba = BundleAdjustment(cams, {"cam1": obs1, "cam2": obs2},
                          pts, cfg=BAConfig(min_points=10))
    out = ba.run()
    assert not out.ok and "only 0 multi-view" in out.failure
