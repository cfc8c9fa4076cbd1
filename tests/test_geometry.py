"""Geometry-op parity tests against OpenCV (the reference's backend)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from icepy4d_tpu.ops import geometry as geom
from icepy4d_tpu.ops import transforms as tf

RNG = np.random.default_rng(42)

K = np.array([[1500.0, 0, 600], [0, 1480.0, 400], [0, 0, 1]], np.float32)
DIST5 = np.array([-0.09, 0.085, 1.7e-4, -8.7e-4, 0.01], np.float32)
RVEC = np.array([0.1, -0.2, 0.05], np.float32)
TVEC = np.array([0.5, -0.3, 2.0], np.float32)


def _extrinsics():
    R, _ = cv2.Rodrigues(RVEC)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = TVEC
    return E


def test_project_points_matches_cv2():
    pts = RNG.normal(size=(100, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 10.0  # keep in front of camera
    E = _extrinsics()
    ours = np.asarray(geom.project_points(jnp.asarray(pts), jnp.asarray(K),
                                          jnp.asarray(E), jnp.asarray(DIST5)))
    ref, _ = cv2.projectPoints(pts.astype(np.float64), RVEC.astype(np.float64),
                               TVEC.astype(np.float64), K.astype(np.float64),
                               DIST5.astype(np.float64))
    np.testing.assert_allclose(ours, ref.reshape(-1, 2), atol=5e-2)


def test_undistort_points_matches_cv2():
    px = RNG.uniform([100, 100], [1100, 700], size=(200, 2)).astype(np.float32)
    ours = np.asarray(geom.undistort_points(jnp.asarray(px), jnp.asarray(K),
                                            jnp.asarray(DIST5)))
    ref = cv2.undistortPoints(px.reshape(-1, 1, 2).astype(np.float64),
                              K.astype(np.float64), DIST5.astype(np.float64),
                              P=K.astype(np.float64)).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_distort_undistort_roundtrip():
    xn = RNG.uniform(-0.3, 0.3, size=(500, 2)).astype(np.float32)
    d = geom.pad_distortion(jnp.asarray(DIST5))
    xd = geom.distort_normalized(jnp.asarray(xn), d)
    xu = geom.undistort_normalized(xd, d)
    np.testing.assert_allclose(np.asarray(xu), xn, atol=1e-5)


def test_rodrigues_roundtrip():
    R_ours = np.asarray(tf.rodrigues_to_matrix(jnp.asarray(RVEC)))
    R_cv, _ = cv2.Rodrigues(RVEC)
    np.testing.assert_allclose(R_ours, R_cv, atol=1e-6)
    r_back = np.asarray(tf.matrix_to_rodrigues(jnp.asarray(R_cv.astype(np.float32))))
    np.testing.assert_allclose(r_back, RVEC, atol=1e-5)


def test_euler_roundtrip():
    angles = (0.3, -0.5, 1.2)
    R = tf.euler_matrix(*[jnp.float32(a) for a in angles])
    back = tf.euler_from_matrix(R)
    np.testing.assert_allclose([float(b) for b in back], angles, atol=1e-5)


def test_quaternion_roundtrip():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        q = tf.quaternion_from_matrix(jnp.asarray(Q.astype(np.float32)))
        R2 = np.asarray(tf.matrix_from_quaternion(q))
        np.testing.assert_allclose(R2, Q, atol=1e-5)


def test_similarity_from_points():
    rng = np.random.default_rng(3)
    v0 = rng.normal(size=(30, 3)).astype(np.float32)
    angles = (0.2, 0.4, -0.3)
    R = np.asarray(tf.euler_matrix(*[jnp.float32(a) for a in angles]))
    s, t = 2.5, np.array([10.0, -5.0, 3.0], np.float32)
    v1 = (s * (v0 @ R.T) + t).astype(np.float32)
    T = np.asarray(tf.similarity_from_points(jnp.asarray(v0), jnp.asarray(v1)))
    np.testing.assert_allclose(T[:3, :3], s * R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)
    # no-scale variant recovers rotation only
    T2 = np.asarray(tf.similarity_from_points(jnp.asarray(v0), jnp.asarray(v1),
                                              with_scale=False))
    np.testing.assert_allclose(T2[:3, :3], R, atol=1e-3)


def test_gauss_newton_helmert_refinement():
    rng = np.random.default_rng(4)
    v0 = rng.normal(size=(40, 3)).astype(np.float32)
    R = np.asarray(tf.euler_matrix(jnp.float32(0.1), jnp.float32(-0.2),
                                   jnp.float32(0.3)))
    s, t = 1.2, np.array([1.0, 2.0, 3.0], np.float32)
    v1 = (s * (v0 @ R.T) + t).astype(np.float32)
    # start from a perturbed linear estimate
    T0 = np.asarray(tf.similarity_from_points(jnp.asarray(v0 + 0.01),
                                              jnp.asarray(v1)))
    T = np.asarray(tf.refine_similarity_gauss_newton(
        jnp.asarray(T0), jnp.asarray(v0), jnp.asarray(v1)))
    np.testing.assert_allclose(T[:3, :3], s * R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)


def test_reprojection_error_masked():
    obs = jnp.zeros((4, 2))
    proj = jnp.array([[3.0, 4.0], [0, 0], [6.0, 8.0], [100.0, 0]])
    mask = jnp.array([True, True, True, False])
    _, rmse = geom.compute_reprojection_error(obs, proj, mask)
    # sqrt(mean([25, 0, 100])) with the masked point excluded
    np.testing.assert_allclose(float(rmse), np.sqrt(125.0 / 3.0), atol=1e-5)


def test_numpy_geometry_mirrors_device_ops():
    """ops/geometry_np.py must agree with the jit ops it mirrors."""
    import numpy as np

    from icepy4d_tpu.ops import geometry as g
    from icepy4d_tpu.ops import geometry_np as gn

    rng = np.random.default_rng(3)
    K = np.array([[3000.0, 0.5, 2000.0], [0, 3010.0, 1500.0], [0, 0, 1]],
                 np.float32)
    dist = np.array([-0.1, 0.05, 1e-3, -2e-3, 0.01], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [0.2, -0.1, 0.5]
    pts3d = rng.uniform([-2, -2, 4], [2, 2, 12], (257, 3)).astype(np.float32)

    dev = np.asarray(g.project_points(
        jnp.asarray(pts3d), jnp.asarray(K), jnp.asarray(ext),
        jnp.asarray(dist)))
    host = gn.project_points(pts3d, K, ext, dist)
    np.testing.assert_allclose(host, dev, atol=1e-2, rtol=1e-5)

    pix = rng.uniform([100, 100], [3900, 2900], (129, 2)).astype(np.float32)
    devu = np.asarray(g.undistort_points(
        jnp.asarray(pix), jnp.asarray(K), jnp.asarray(dist)))
    hostu = gn.undistort_points(pix, K, dist)
    np.testing.assert_allclose(hostu, devu, atol=1e-2, rtol=1e-5)

    from icepy4d_tpu.ops.transforms import rodrigues_to_matrix as dev_rod
    rv = np.array([0.3, -0.2, 0.9], np.float32)
    np.testing.assert_allclose(gn.rodrigues_to_matrix(rv),
                               np.asarray(dev_rod(jnp.asarray(rv))),
                               atol=1e-5)
    np.testing.assert_allclose(gn.rodrigues_to_matrix([0.0, 0.0, 0.0]),
                               np.eye(3), atol=1e-7)


def test_numpy_euler_matches_device():
    from icepy4d_tpu.ops import geometry_np as gn
    from icepy4d_tpu.ops import transforms as tf

    rng = np.random.default_rng(4)
    for _ in range(20):
        rv = rng.normal(size=3)
        R = gn.rodrigues_to_matrix(rv)
        host = gn.euler_from_matrix(R)
        dev = tf.euler_from_matrix(jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(host),
                                   np.asarray([np.asarray(d) for d in dev]),
                                   atol=1e-5)


def test_numpy_similarity_matches_device():
    from icepy4d_tpu.ops import geometry_np as gn
    from icepy4d_tpu.ops import transforms as tf

    rng = np.random.default_rng(5)
    v0 = rng.normal(size=(12, 3)).astype(np.float32)
    R = gn.rodrigues_to_matrix([0.2, -0.4, 0.7])
    v1 = 1.7 * v0 @ R.T + np.array([3.0, -1.0, 2.0], np.float32)
    for ws in (True, False):
        host = gn.similarity_from_points(v0, v1, with_scale=ws)
        dev = np.asarray(tf.similarity_from_points(
            jnp.asarray(v0), jnp.asarray(v1), with_scale=ws))
        np.testing.assert_allclose(host, dev, atol=1e-4, rtol=1e-4)
