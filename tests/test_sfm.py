"""SfM stack tests: RANSAC estimators, triangulation, and the sfm classes.

Golden oracles: closed-form synthetic scenes (exact ground truth) and
OpenCV (cv2) where the reference used it (ref tests/test_sfm_geometry.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.ops import epipolar, ransac as ransac_ops
from icepy4d_tpu.ops import triangulation as tri
from icepy4d_tpu.sfm import (
    AbsoluteOrientation,
    RelativeOrientation,
    SpaceResection,
    Triangulate,
    estimate_pose,
)

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# Synthetic stereo scene fixtures
# ---------------------------------------------------------------------------

def make_scene(n=200, n_out=40, seed=0, dist0=None, dist1=None):
    """Two cameras looking at a 3D point cloud; returns exact GT."""
    rng = np.random.default_rng(seed)
    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    pts3d = np.stack(
        [rng.uniform(-10, 10, n), rng.uniform(-6, 6, n), rng.uniform(20, 50, n)],
        axis=1,
    )
    # Camera 0 at origin; camera 1 translated + rotated.
    R0, t0 = np.eye(3), np.zeros(3)
    angle = 0.15
    R1 = cv2.Rodrigues(np.array([0.02, angle, -0.03]))[0]
    t1 = np.array([-4.0, 0.3, 0.5])  # world->cam translation

    def project(R, t, dist):
        rvec = cv2.Rodrigues(R)[0]
        d = np.zeros(8) if dist is None else np.asarray(dist, np.float64)
        uv, _ = cv2.projectPoints(pts3d, rvec, t, K, d)
        return uv.squeeze(1)

    uv0 = project(R0, t0, dist0)
    uv1 = project(R1, t1, dist1)
    # Outliers: random positions.
    uv0_o = np.concatenate([uv0, rng.uniform(0, 1900, (n_out, 2))])
    uv1_o = np.concatenate([uv1, rng.uniform(0, 1000, (n_out, 2))])
    gt_inlier = np.concatenate([np.ones(n, bool), np.zeros(n_out, bool)])
    return dict(
        K=K, pts3d=pts3d, R1=R1, t1=t1,
        uv0=uv0, uv1=uv1, uv0_o=uv0_o, uv1_o=uv1_o, gt_inlier=gt_inlier,
    )


@pytest.fixture(scope="module")
def scene():
    return make_scene()


# ---------------------------------------------------------------------------
# Fundamental RANSAC (geometric verification replacement)
# ---------------------------------------------------------------------------

def test_ransac_fundamental_rejects_outliers(scene):
    x0 = jnp.asarray(scene["uv0_o"], jnp.float32)
    x1 = jnp.asarray(scene["uv1_o"], jnp.float32)
    mask = jnp.ones((x0.shape[0],), bool)
    F, inl = ransac_ops.ransac_fundamental(
        jax.random.PRNGKey(0), x0, x1, mask, threshold=1.5
    )
    inl = np.asarray(inl)
    gt = scene["gt_inlier"]
    # All true inliers kept, (almost) all outliers rejected.
    assert inl[gt].mean() > 0.98
    assert inl[~gt].mean() < 0.05
    # F satisfies the epipolar constraint on true correspondences.
    d = np.asarray(
        epipolar.sampson_distance(
            F, jnp.asarray(scene["uv0"], jnp.float32),
            jnp.asarray(scene["uv1"], jnp.float32),
        )
    )
    assert np.sqrt(np.median(d)) < 0.5  # px


def test_sampson_matches_cv2(scene):
    # cv2-estimated F should score near-zero Sampson distance in our metric.
    F, _ = cv2.findFundamentalMat(
        scene["uv0"], scene["uv1"], cv2.FM_8POINT
    )
    d = np.asarray(
        epipolar.sampson_distance(
            jnp.asarray(F, jnp.float32),
            jnp.asarray(scene["uv0"], jnp.float32),
            jnp.asarray(scene["uv1"], jnp.float32),
        )
    )
    assert np.sqrt(np.mean(d)) < 0.1


# ---------------------------------------------------------------------------
# Essential + pose recovery
# ---------------------------------------------------------------------------

def test_ransac_essential_pose_recovers_gt(scene):
    K = jnp.asarray(scene["K"], jnp.float32)
    R, t, E, inl = ransac_ops.ransac_essential_pose(
        jax.random.PRNGKey(1),
        jnp.asarray(scene["uv0_o"], jnp.float32),
        jnp.asarray(scene["uv1_o"], jnp.float32),
        K, K,
        jnp.ones((scene["uv0_o"].shape[0],), bool),
        threshold_px=1.0,
    )
    R = np.asarray(R)
    t = np.asarray(t)
    # Rotation error in degrees.
    dR = R @ scene["R1"].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2
    # Translation direction (up to scale).
    t_gt = scene["t1"] / np.linalg.norm(scene["t1"])
    cos = abs(float(t @ t_gt))
    assert cos > 0.999
    assert np.asarray(inl)[scene["gt_inlier"]].mean() > 0.95


def test_estimate_pose_api_parity(scene):
    """Free-function estimate_pose mirrors reference semantics incl. <5 pts."""
    assert estimate_pose(
        scene["uv0"][:4], scene["uv1"][:4], scene["K"], scene["K"]
    ) is None
    R, t, valid = estimate_pose(
        scene["uv0"], scene["uv1"], scene["K"], scene["K"], thresh=1.0
    )
    assert R.shape == (3, 3) and t.shape == (3, 1)
    assert valid.sum() > 190


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------

def test_iterative_triangulation_exact(scene):
    K = scene["K"]
    P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = K @ np.hstack([scene["R1"], scene["t1"][:, None]])
    pts, status = tri.iterative_ls_triangulation(
        jnp.asarray(scene["uv0"], jnp.float32),
        jnp.asarray(scene["uv1"], jnp.float32),
        jnp.asarray(P0, jnp.float32),
        jnp.asarray(P1, jnp.float32),
    )
    pts = np.asarray(pts)
    err = np.linalg.norm(pts - scene["pts3d"], axis=1)
    assert np.median(err) < 0.01  # scene units (meters at 20-50 m depth)
    assert np.asarray(status).mean() > 0.95


def test_linear_eigen_matches_cv2(scene):
    K = scene["K"]
    P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = K @ np.hstack([scene["R1"], scene["t1"][:, None]])
    ours = np.asarray(
        tri.linear_eigen_triangulation(
            jnp.asarray(scene["uv0"], jnp.float32),
            jnp.asarray(scene["uv1"], jnp.float32),
            jnp.asarray(P0, jnp.float32),
            jnp.asarray(P1, jnp.float32),
        )
    )
    X = cv2.triangulatePoints(P0, P1, scene["uv0"].T, scene["uv1"].T)
    ref = (X[:3] / X[3]).T
    assert np.median(np.linalg.norm(ours - ref, axis=1)) < 0.05


def test_nview_triangulation(scene):
    K = scene["K"]
    P0 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P1 = K @ np.hstack([scene["R1"], scene["t1"][:, None]])
    us = jnp.stack(
        [jnp.asarray(scene["uv0"], jnp.float32),
         jnp.asarray(scene["uv1"], jnp.float32)]
    )
    Ps = jnp.stack([jnp.asarray(P0, jnp.float32), jnp.asarray(P1, jnp.float32)])
    pts = np.asarray(tri.triangulate_nview(us, Ps))
    assert np.median(np.linalg.norm(pts - scene["pts3d"], axis=1)) < 0.05


def test_bilinear_interpolation():
    img = jnp.arange(16.0).reshape(4, 4)
    xy = jnp.array([[1.5, 1.5], [0.0, 0.0], [3.0, 3.0]])
    out = np.asarray(tri.interpolate_bilinear(img, xy))
    assert np.allclose(out, [7.5, 0.0, 15.0], atol=1e-5)


# ---------------------------------------------------------------------------
# PnP / space resection
# ---------------------------------------------------------------------------

def test_ransac_pnp_recovers_pose(scene):
    rng = np.random.default_rng(3)
    pts2d = scene["uv1"].copy()
    out_idx = rng.choice(len(pts2d), 30, replace=False)
    pts2d[out_idx] += rng.uniform(30, 120, (30, 2))
    R, t, inl = ransac_ops.ransac_pnp(
        jax.random.PRNGKey(2),
        jnp.asarray(scene["pts3d"], jnp.float32),
        jnp.asarray(pts2d, jnp.float32),
        jnp.asarray(scene["K"], jnp.float32),
        jnp.ones((len(pts2d),), bool),
        threshold_px=2.0,
    )
    dR = np.asarray(R) @ scene["R1"].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2
    assert np.linalg.norm(np.asarray(t) - scene["t1"]) < 0.05


def test_space_resection_class(scene):
    cam = Camera.create(1920, 1080, K=scene["K"])
    sr = SpaceResection(cam)
    cam = sr.estimate(scene["uv1"], scene["pts3d"])
    assert np.allclose(np.asarray(cam.R), scene["R1"], atol=1e-3)
    assert np.allclose(np.asarray(cam.t), scene["t1"], atol=0.05)


# ---------------------------------------------------------------------------
# End-to-end: relative orientation -> triangulation -> absolute orientation
# ---------------------------------------------------------------------------

def test_stereo_pipeline_end_to_end():
    dist = np.array([-0.09, 0.085, 0.0002, -0.0009])
    sc = make_scene(n=300, n_out=50, seed=7, dist0=dist, dist1=dist)
    cam0 = Camera.create(1920, 1080, K=sc["K"], dist=dist)
    cam1 = Camera.create(1920, 1080, K=sc["K"], dist=dist)

    ro = RelativeOrientation(
        [cam0, cam1], [sc["uv0_o"], sc["uv1_o"]]
    )
    valid = ro.estimate_pose(threshold=1.5)
    # Scale by the true baseline.
    baseline_world = float(np.linalg.norm(-sc["R1"].T @ sc["t1"]))
    scale = ro.get_scale_factor_from_baseline(baseline_world)
    ro2 = RelativeOrientation(
        [cam0, Camera.create(1920, 1080, K=sc["K"], dist=dist)],
        [sc["uv0_o"], sc["uv1_o"]],
    )
    ro2.estimate_pose(threshold=1.5, scale_factor=scale)
    cam1 = ro2.cameras[1]

    # Triangulate the ground-truth inliers.
    gt = sc["gt_inlier"]
    t = Triangulate([cam0, cam1], [sc["uv0_o"][gt], sc["uv1_o"][gt]])
    pts = t.triangulate_two_views()
    err = np.linalg.norm(pts - sc["pts3d"], axis=1)
    assert np.median(err) < 0.05

    # Absolute orientation onto a synthetic world frame.
    Tw = np.eye(4)
    Tw[:3, :3] = cv2.Rodrigues(np.array([0.1, -0.2, 0.4]))[0] * 1.8
    Tw[:3, 3] = [100.0, -50.0, 8.0]
    world_pts = (Tw[:3, :3] @ sc["pts3d"].T).T + Tw[:3, 3]
    targets = slice(0, 12)
    ao = AbsoluteOrientation(
        (cam0, cam1),
        points3d_final=world_pts[targets],
        points3d_orig=pts[targets],
    )
    T_est = ao.estimate_transformation_linear(estimate_scale=True)
    ao.estimate_transformation_least_squares()
    moved = ao.apply_transformation(points3d=pts)
    err_w = np.linalg.norm(moved - world_pts, axis=1)
    assert np.median(err_w) < 0.2
    # Camera centres land on the transformed positions.
    C0_w = (Tw[:3, :3] @ np.zeros(3)) + Tw[:3, 3]
    assert np.linalg.norm(np.asarray(ao.cameras[0].C) - C0_w) < 0.5


def test_absolute_orientation_utm_scale_precision():
    """UTM-scale survey coordinates (review finding): the f32 kernels
    must only see centroid-relative values, else every GCP quantizes by
    ~0.5 m. Recovery must be centimeter-level at 5e6 m northings."""
    import numpy as np

    from icepy4d_tpu.core import Camera
    from icepy4d_tpu.sfm import AbsoluteOrientation

    rng = np.random.default_rng(0)
    v0 = rng.uniform(-50, 50, (12, 3))             # model frame
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0],
                  [0, 0, 1.0]])
    s = 1.7
    t = np.array([416_000.0, 5_090_000.0, 2_200.0])  # UTM-ish
    v1 = (s * (v0 @ R.T)) + t

    K = np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]])
    cams = (Camera.create(width=1000, height=1000, K=K),
            Camera.create(width=1000, height=1000, K=K))
    ao = AbsoluteOrientation(cams, points3d_final=v1, points3d_orig=v0)
    ao.estimate_transformation_linear(estimate_scale=True)
    ao.estimate_transformation_least_squares()
    got = ao.apply_transformation(points3d=v0)
    err = np.linalg.norm(got - v1, axis=1)
    assert err.max() < 0.02, err.max()


def test_least_squares_helmert_utm_scale():
    """least_squares module: same UTM-precision guarantee as sfm.AO."""
    import numpy as np

    from icepy4d_tpu.least_squares.absolute_orientation import (
        estimate_similarity_least_squares)

    rng = np.random.default_rng(4)
    x0 = rng.uniform(-40, 40, (15, 3))
    ang = -0.2
    R = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1.0, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([432_100.0, 5_123_456.0, 1_800.0])
    x1 = 0.8 * (x0 @ R.T) + t
    T, rep = estimate_similarity_least_squares(x0, x1)
    assert rep["rmse"] < 0.01, rep["rmse"]
    got = x0 @ T[:3, :3].T + T[:3, 3]
    assert np.abs(got - x1).max() < 0.02
