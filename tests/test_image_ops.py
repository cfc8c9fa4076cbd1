"""Device image-pipeline ops vs OpenCV ground truth."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from icepy4d_tpu.ops import image as imops


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)


def test_rgb_to_gray_matches_cv2(rgb):
    ours = np.asarray(imops.rgb_to_gray(jnp.asarray(rgb)))
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pyr_down_matches_cv2(rgb):
    ours = np.asarray(imops.pyr_down(jnp.asarray(rgb)))
    ref = cv2.pyrDown(rgb)
    assert ours.shape == ref.shape
    # interior only: cv2 uses BORDER_REFLECT_101, we use reflect
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-4)


def test_pyr_up_matches_cv2(rgb):
    ours = np.asarray(imops.pyr_up(jnp.asarray(rgb)))
    ref = cv2.pyrUp(rgb)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-4)


def test_quality_ladder_shapes(rgb):
    img = jnp.asarray(rgb)
    assert imops.quality_resize(img, "highest").shape[:2] == (128, 160)
    assert imops.quality_resize(img, "high").shape[:2] == (64, 80)
    assert imops.quality_resize(img, "medium").shape[:2] == (32, 40)
    assert imops.quality_resize(img, "low").shape[:2] == (16, 20)


def test_tile_limits_cover_image():
    lims = imops.compute_tile_limits(480, 640, (2, 3), overlap=20)
    assert lims.shape == (6, 4)
    x0, y0, tw, th = lims[:, 0], lims[:, 1], lims[:, 2], lims[:, 3]
    assert (x0 >= 0).all() and (y0 >= 0).all()
    assert (x0 + tw <= 640).all() and (y0 + th <= 480).all()
    # union of tiles covers the full image
    cov = np.zeros((480, 640), bool)
    for x, y, w, h in lims:
        cov[y:y + h, x:x + w] = True
    assert cov.all()


def test_extract_tiles_values(rgb):
    lims = imops.compute_tile_limits(64, 80, (2, 2), overlap=4)
    tiles = np.asarray(
        imops.extract_tiles(
            jnp.asarray(rgb), jnp.asarray(lims[:, :2]),
            int(lims[0, 3]), int(lims[0, 2]),
        )
    )
    for k, (x, y, w, h) in enumerate(lims):
        np.testing.assert_array_equal(tiles[k], rgb[y:y + h, x:x + w])


def test_bilinear_sample_matches_remap(rgb):
    rng = np.random.default_rng(1)
    xy = rng.uniform(1, 60, (50, 2)).astype(np.float32)
    ours = np.asarray(imops.bilinear_sample(jnp.asarray(rgb), jnp.asarray(xy)))
    ref = cv2.remap(rgb, xy[None, :, 0], xy[None, :, 1], cv2.INTER_LINEAR)[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_warp_homography_identity(rgb):
    out = np.asarray(imops.warp_homography(jnp.asarray(rgb), jnp.eye(3), 64, 80))
    np.testing.assert_allclose(out, rgb, atol=1e-5)


def test_warp_homography_matches_cv2(rgb):
    H = np.array([[1.02, 0.01, 3.0], [-0.015, 0.99, -2.0], [1e-5, 0, 1.0]],
                 np.float32)
    ours = np.asarray(imops.warp_homography(jnp.asarray(rgb), jnp.asarray(H), 64, 80))
    ref = cv2.warpPerspective(rgb, H, (80, 64), flags=cv2.INTER_LINEAR)
    # compare away from borders (border handling differs)
    np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4], atol=2e-3)


def test_undistort_image_matches_cv2(rgb):
    K = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)
    dist = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.0], np.float32)
    ours = np.asarray(
        imops.undistort_image(jnp.asarray(rgb), jnp.asarray(K), jnp.asarray(dist))
    )
    ref = cv2.undistort(rgb, K, dist)
    interior = (slice(8, -8), slice(8, -8))
    # sampling maps agree to <1e-5 px; the residual is cv2.remap's 5-bit
    # fixed-point bilinear quantization (ours is exact float)
    np.testing.assert_allclose(ours[interior], ref[interior], atol=4e-2)
    assert np.median(np.abs(ours[interior] - ref[interior])) < 5e-3
