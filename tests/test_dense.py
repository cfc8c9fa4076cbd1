"""Dense reconstruction tests: plane sweep on a synthetic textured plane
+ DSM gridding / orthophoto / DEM differencing.

(The reference has no dense tests — dense reconstruction is delegated to
Metashape; this suite validates the native replacement end to end.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.ops.dense import (depth_to_points, plane_homography,
                                   plane_sweep, relative_motion)
from icepy4d_tpu.sfm.dense import PlaneSweepStereo
from icepy4d_tpu.utils.dsm_orthophoto import (DSM, build_dsm,
                                              dem_of_difference,
                                              generate_orthophoto)

H, W = 160, 200
F = 220.0
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def _texture(seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = np.zeros((H * 2, W * 2), np.float32)
    for cell in (6, 12, 24):
        lo = rng.uniform(size=(H * 2 // cell + 1, W * 2 // cell + 1))
        img += cv2.resize(lo.astype(np.float32), (W * 2, H * 2),
                          interpolation=cv2.INTER_CUBIC)
    img -= img.min()
    return img / img.max()


@pytest.fixture(scope="module")
def stereo_plane():
    """Fronto-parallel textured plane at Z=10 seen by two cameras."""
    tex = _texture()

    E0 = np.eye(4, dtype=np.float32)
    E1 = np.eye(4, dtype=np.float32)
    E1[0, 3] = -1.0  # camera 1 one unit to the right (t = -R C)

    Z = 10.0
    # render both views by sampling the texture as the plane's albedo
    # (texture coords = plane X, Y)
    import cv2

    ys, xs = np.mgrid[0:H, 0:W]

    def render(E):
        R = E[:3, :3]
        C = -R.T @ E[:3, 3]
        rays = np.stack([(xs - K[0, 2]) / F, (ys - K[1, 2]) / F,
                         np.ones_like(xs, np.float32)], -1)
        rays = rays @ R  # world dirs (R^T @ ray)
        s = (Z - C[2]) / rays[..., 2]
        X = C + s[..., None] * rays
        # texture lookup: map world X, Y in [-2.5, 2.5] to texture px
        u = (X[..., 0] + 3.0) / 6.0 * (W * 2 - 1)
        v = (X[..., 1] + 2.5) / 5.0 * (H * 2 - 1)
        return cv2.remap(tex, u.astype(np.float32), v.astype(np.float32),
                         cv2.INTER_LINEAR)

    return render(E0), render(E1), E0, E1, Z


def test_plane_homography_roundtrip(stereo_plane):
    _, _, E0, E1, Z = stereo_plane
    R, t = relative_motion(jnp.asarray(E0), jnp.asarray(E1))
    Hm = np.asarray(plane_homography(jnp.asarray(K), jnp.asarray(K), R, t,
                                     jnp.asarray(Z)))
    # a pixel on the plane must map to the epipolar-shifted pixel:
    # disparity = f * baseline / Z = 220 / 10 = 22 px
    p = np.array([100.0, 80.0, 1.0])
    q = Hm @ p
    q = q[:2] / q[2]
    np.testing.assert_allclose(q, [100.0 - 22.0, 80.0], atol=1e-3)


def test_plane_sweep_recovers_plane_depth(stereo_plane):
    I0, I1, E0, E1, Z = stereo_plane
    out = plane_sweep(
        jnp.asarray(I0), jnp.asarray(I1), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(E0), jnp.asarray(E1),
        depth_min=5.0, depth_max=20.0, n_planes=64, window=7)
    depth = np.asarray(out["depth"])
    cost = np.asarray(out["cost"])
    good = np.asarray(out["inbounds"]) & (cost < 0.2)
    # central region (excluding disparity-occluded left edge)
    sel = good[20:-20, 40:-20]
    assert sel.mean() > 0.8
    err = np.abs(depth[20:-20, 40:-20][sel] - Z)
    assert np.median(err) < 0.05  # subpixel in inverse depth
    # also ensure plenty of sub-plane-step accuracy (step ~0.24 at Z=10)
    assert np.percentile(err, 90) < 0.3


def test_depth_to_points_world_frame(stereo_plane):
    I0, _, E0, _, Z = stereo_plane
    depth = jnp.full((H, W), Z)
    pts, _ = depth_to_points(depth, jnp.asarray(K), jnp.asarray(E0))
    pts = np.asarray(pts)
    np.testing.assert_allclose(pts[:, 2], Z, atol=1e-4)


def test_plane_sweep_stereo_class(stereo_plane):
    I0, I1, E0, E1, Z = stereo_plane
    cam0 = Camera.create(width=W, height=H, K=K, extrinsics=E0)
    cam1 = Camera.create(width=W, height=H, K=K, extrinsics=E1)
    pss = PlaneSweepStereo([cam0, cam1], [I0, I1], depth_min=5.0,
                           depth_max=20.0, n_planes=64,
                           cost_threshold=0.2)
    res = pss.run()
    assert res["valid"].mean() > 0.5
    pts, colors = pss.to_point_cloud()
    assert pts.shape[1] == 3
    assert np.abs(np.median(pts[:, 2]) - Z) < 0.1


# ---------------------------------------------------------------------------
# DSM / orthophoto / DEM difference
# ---------------------------------------------------------------------------

def test_build_dsm_binned_mean():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 10, (5000, 2))
    z = 2.0 + 0.5 * xy[:, 0]
    pts = np.column_stack([xy, z]).astype(np.float32)
    dsm = build_dsm(pts, dsm_step=1.0, xlim=(0, 10), ylim=(0, 10),
                    fill_holes=False)
    assert dsm.z.shape == (10, 10)
    assert dsm.mask.all()
    expect = 2.0 + 0.5 * dsm.xx
    got = np.nanmean(dsm.z, axis=0)
    np.testing.assert_allclose(got, expect, atol=0.2)


def test_build_dsm_fills_holes():
    pts = np.array([[0.5, 0.5, 1.0], [4.5, 0.5, 5.0], [2.5, 4.5, 3.0]],
                   np.float32)
    dsm = build_dsm(pts, dsm_step=1.0, xlim=(0, 5), ylim=(0, 5),
                    fill_holes=True, fill_iters=6)
    assert dsm.mask.all()
    assert np.isfinite(dsm.z).all()
    assert dsm.z.min() >= 1.0 - 1e-5 and dsm.z.max() <= 5.0 + 1e-5


def test_orthophoto_samples_colors():
    cam = Camera.create(width=W, height=H, K=K)
    img = np.zeros((H, W, 3), np.float32)
    img[:, :, 0] = 1.0  # red scene
    pts = np.stack(np.meshgrid(np.linspace(-2, 2, 30),
                               np.linspace(-1.5, 1.5, 30)), -1)
    pts = np.concatenate([pts.reshape(-1, 2),
                          np.full((900, 1), 10.0)], 1).astype(np.float32)
    dsm = build_dsm(pts, dsm_step=0.2, xlim=(-2, 2), ylim=(-1.5, 1.5))
    rgb, valid = generate_orthophoto(img, dsm, cam)
    assert valid.mean() > 0.8
    np.testing.assert_allclose(rgb[valid][:, 0], 1.0, atol=1e-5)


def test_dem_of_difference_volume():
    g = np.stack(np.meshgrid(np.linspace(0.5, 9.5, 40),
                             np.linspace(0.5, 9.5, 40)), -1).reshape(-1, 2)
    p0 = np.concatenate([g, np.full((1600, 1), 2.0)], 1).astype(np.float32)
    p1 = np.concatenate([g, np.full((1600, 1), 3.0)], 1).astype(np.float32)
    d0 = build_dsm(p0, 1.0, xlim=(0, 10), ylim=(0, 10))
    d1 = build_dsm(p1, 1.0, xlim=(0, 10), ylim=(0, 10))
    dz, rep = dem_of_difference(d0, d1)
    # one meter of uplift over 100 m^2
    assert abs(rep.net - 100.0) < 1.0
    assert rep.removed < 1e-6
    assert abs(rep.mean_dz - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# rectification + disparity sweep (the fast TPU path)
# ---------------------------------------------------------------------------

def test_rectify_identity_for_rectified_rig(stereo_plane):
    from icepy4d_tpu.ops.rectify import rectify_pair

    _, _, E0, E1, _ = stereo_plane
    r = rectify_pair(jnp.asarray(K), jnp.asarray(E0),
                     jnp.asarray(K), jnp.asarray(E1))
    # rig is already rectified (pure x baseline): H ~ identity
    np.testing.assert_allclose(np.asarray(r["H0"]), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r["H1"]), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(float(r["baseline"]), 1.0, atol=1e-6)


def test_disparity_sweep_recovers_depth(stereo_plane):
    from icepy4d_tpu.ops.dense import disparity_sweep
    from icepy4d_tpu.ops.rectify import disparity_to_depth

    I0, I1, E0, E1, Z = stereo_plane
    # rectified rig: disparity = f * B / Z = 22
    out = disparity_sweep(jnp.asarray(I0), jnp.asarray(I1),
                          disp_min=10.0, disp_max=45.0, n_disp=96)
    disp = np.asarray(out["disparity"])
    good = np.asarray(out["inbounds"]) & (np.asarray(out["cost"]) < 0.2)
    sel = good[20:-20, 40:-20]
    assert sel.mean() > 0.8
    err = np.abs(disp[20:-20, 40:-20][sel] - 22.0)
    assert np.median(err) < 0.15
    depth = disparity_to_depth(jnp.asarray(disp), jnp.asarray(K),
                               jnp.asarray(1.0))
    derr = np.abs(np.asarray(depth)[20:-20, 40:-20][sel] - Z)
    assert np.median(derr) < 0.1


def test_rectified_sweep_on_rotated_rig():
    """Rotate camera 1; rectification must recover the plane depth."""
    import cv2

    from icepy4d_tpu.ops.dense import disparity_sweep
    from icepy4d_tpu.ops.image import warp_homography
    from icepy4d_tpu.ops.rectify import (disparity_to_depth,
                                         rect_pixels_to_world,
                                         rectify_pair)
    from icepy4d_tpu.ops.transforms import euler_matrix

    tex = _texture(1)
    Z = 10.0
    E0 = np.eye(4, dtype=np.float32)
    E1 = np.eye(4, dtype=np.float32)
    Rr = np.asarray(euler_matrix(jnp.asarray(0.0),
                                 jnp.asarray(np.deg2rad(2.0)),
                                 jnp.asarray(np.deg2rad(1.0))))
    E1[:3, :3] = Rr
    E1[:3, 3] = Rr @ np.array([-1.0, 0, 0], np.float32)  # C1=(1,0,0)

    ys, xs = np.mgrid[0:H, 0:W]

    def render(E):
        R = E[:3, :3]
        C = -R.T @ E[:3, 3]
        rays = np.stack([(xs - K[0, 2]) / F, (ys - K[1, 2]) / F,
                         np.ones_like(xs, np.float32)], -1) @ R
        s = (Z - C[2]) / rays[..., 2]
        X = C + s[..., None] * rays
        u = (X[..., 0] + 3.0) / 6.0 * (W * 2 - 1)
        v = (X[..., 1] + 2.5) / 5.0 * (H * 2 - 1)
        return cv2.remap(tex, u.astype(np.float32),
                         v.astype(np.float32), cv2.INTER_LINEAR)

    I0, I1 = render(E0), render(E1)
    r = rectify_pair(jnp.asarray(K), jnp.asarray(E0),
                     jnp.asarray(K), jnp.asarray(E1))
    I0r = warp_homography(jnp.asarray(I0), r["H0"], H, W)
    I1r = warp_homography(jnp.asarray(I1), r["H1"], H, W)
    f_new = float(r["K_new"][0, 0])
    d0 = f_new * 1.0 / 20.0
    d1 = f_new * 1.0 / 5.0
    out = disparity_sweep(I0r, I1r, disp_min=d0, disp_max=d1, n_disp=96)
    disp = np.asarray(out["disparity"])
    good = np.asarray(out["inbounds"]) & (np.asarray(out["cost"]) < 0.15)
    inner = good[30:-30, 50:-30]
    assert inner.mean() > 0.5
    depth = np.asarray(disparity_to_depth(
        jnp.asarray(disp), r["K_new"], r["baseline"]))
    derr = np.abs(depth[30:-30, 50:-30][inner] - Z)
    assert np.median(derr) < 0.1
    # world unprojection lands on the Z=10 plane
    yy, xx = np.mgrid[30:H - 30, 50:W - 30]
    pix = np.stack([xx[inner], yy[inner]], -1).astype(np.float32)
    pts = np.asarray(rect_pixels_to_world(
        jnp.asarray(pix), jnp.asarray(depth[30:-30, 50:-30][inner]),
        r["K_new"], r["R_new"], r["C0"]))
    assert np.median(np.abs(pts[:, 2] - Z)) < 0.1


def test_lr_consistency_rejects_occlusion_mismatch(stereo_plane):
    from icepy4d_tpu.ops.dense import disparity_sweep, lr_consistency_mask

    I0, I1, E0, E1, Z = stereo_plane
    fwd = disparity_sweep(jnp.asarray(I0), jnp.asarray(I1),
                          10.0, 45.0, n_disp=64)
    rev = disparity_sweep(jnp.asarray(I1), jnp.asarray(I0),
                          -45.0, -10.0, n_disp=64)
    ok = np.asarray(lr_consistency_mask(fwd["disparity"],
                                        rev["disparity"], tau=1.5))
    inner = ok[20:-20, 40:-20]
    assert inner.mean() > 0.8  # consistent where both views see the plane
    # corrupt the reverse map: consistency must collapse
    bad = np.asarray(rev["disparity"]) + 10.0
    ok2 = np.asarray(lr_consistency_mask(fwd["disparity"],
                                         jnp.asarray(bad), tau=1.5))
    assert ok2[20:-20, 40:-20].mean() < 0.05


def test_plane_sweep_stereo_class_lr(stereo_plane):
    I0, I1, E0, E1, Z = stereo_plane
    cam0 = Camera.create(width=W, height=H, K=K, extrinsics=E0)
    cam1 = Camera.create(width=W, height=H, K=K, extrinsics=E1)
    pss = PlaneSweepStereo([cam0, cam1], [I0, I1], depth_min=5.0,
                           depth_max=20.0, n_planes=64,
                           cost_threshold=0.2, lr_check=True)
    res = pss.run()
    assert res["valid"].mean() > 0.4
    pts, _ = pss.to_point_cloud()
    assert np.abs(np.median(pts[:, 2]) - Z) < 0.1
