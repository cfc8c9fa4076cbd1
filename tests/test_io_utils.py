"""IO exporters + host-side utils: round trips and format sanity."""

import numpy as np
import pytest

from icepy4d_tpu.core.camera import Camera
from icepy4d_tpu.core.features import Features
from icepy4d_tpu.core.points import Points


class FakeImage:
    def __init__(self, name):
        self.name = name
        self.path = f"/data/{name}"


@pytest.fixture()
def scene():
    rng = np.random.default_rng(0)
    K = np.array([[1000.0, 0, 500], [0, 1000.0, 400], [0, 0, 1]])
    cams = {
        "cam1": Camera.create(width=1000, height=800, K=K),
        "cam2": Camera.create(width=1000, height=800, K=K,
                              extrinsics=np.block([
                                  [np.eye(3), np.array([[-1.], [0], [0]])],
                                  [np.zeros((1, 3)), np.ones((1, 1))]])),
    }
    n = 20
    feats = {}
    for c in cams:
        f = Features()
        f.append_features_from_numpy(
            rng.uniform(0, [1000, 800], (n, 2)).astype(np.float32),
            descr=rng.normal(size=(n, 256)).astype(np.float32),
            scores=rng.uniform(size=n).astype(np.float32),
            track_ids=np.arange(n, dtype=np.int32))
        feats[c] = f
    pts = Points()
    pts.append_points_from_numpy(
        rng.uniform(-5, 5, (n, 3)).astype(np.float32),
        track_ids=np.arange(n, dtype=np.int32),
        colors=rng.uniform(size=(n, 3)).astype(np.float32))
    imgs = {"cam1": FakeImage("IMG_001.jpg"), "cam2": FakeImage("IMG_101.jpg")}
    return cams, feats, pts, imgs


def test_bundler_roundtrip(scene, tmp_path):
    from icepy4d_tpu.io import read_bundler_out, write_bundler_out

    cams, feats, pts, imgs = scene
    out = write_bundler_out(tmp_path, "epoch", imgs, cams, feats, pts)
    rcams, rpts, robs = read_bundler_out(out)
    assert len(rcams) == 2
    np.testing.assert_allclose(rcams[0]["f"], 1000.0)
    np.testing.assert_allclose(rpts, pts.to_numpy(), atol=1e-4)
    assert len(robs) == len(pts)
    assert (tmp_path / "im_list.txt").exists()
    # rotation stays orthonormal after the Bundler axis flip
    R = rcams[1]["R"]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_colmap_export(scene, tmp_path):
    from icepy4d_tpu.io import export_solution_to_colmap

    cams, feats, pts, imgs = scene
    export_solution_to_colmap(tmp_path, imgs, cams, feats, pts)
    cam_lines = [l for l in (tmp_path / "cameras.txt").read_text()
                 .splitlines() if not l.startswith("#")]
    assert len(cam_lines) == 2
    assert "OPENCV" in cam_lines[0]
    im_lines = [l for l in (tmp_path / "images.txt").read_text()
                .splitlines() if l and not l.startswith("#")]
    assert len(im_lines) == 2
    # identity extrinsics -> unit quaternion
    q = np.array(list(map(float, im_lines[0].split()[1:5])))
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)
    pts_lines = [l for l in (tmp_path / "points3D.txt").read_text()
                 .splitlines() if not l.startswith("#")]
    assert len(pts_lines) == len(pts)


def test_features_h5(scene, tmp_path):
    h5py = pytest.importorskip("h5py")
    from icepy4d_tpu.io import features_to_h5

    cams, feats, pts, imgs = scene
    fp, mp = features_to_h5(tmp_path, imgs, feats)
    with h5py.File(fp) as f:
        assert set(f) == {"IMG_001.jpg", "IMG_101.jpg"}
        assert f["IMG_001.jpg"]["keypoints"].shape == (20, 2)
    with h5py.File(mp) as f:
        assert f["IMG_001.jpg"]["IMG_101.jpg"].shape == (20, 2)


def test_calge_export(scene, tmp_path):
    from icepy4d_tpu.io import export_keypoints_for_calge

    cams, feats, pts, imgs = scene
    out = export_keypoints_for_calge(
        tmp_path / "calge.txt", feats, imgs,
        image_size=(800, 1000), pixel_size_micron=4.0)
    txt = out.read_text().splitlines()
    assert txt[0].startswith("image_name")
    assert txt.count("-99") == 2


# ---------------------------------------------------------------------------
# geospatial / binned stats / rototranslation / least squares
# ---------------------------------------------------------------------------

def test_geospatial_predicates():
    from icepy4d_tpu.utils import (ccw_sort_points, point_in_hull,
                                   point_in_rect, points_in_rect)

    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    shuffled = sq[[2, 0, 3, 1]]
    s = ccw_sort_points(shuffled)
    assert s.shape == (4, 2)
    assert point_in_rect([0.5, 0.5], [0, 0, 1, 1])
    m = points_in_rect(np.array([[0.5, 0.5], [2, 2]]), [0, 0, 1, 1])
    assert m.tolist() == [True, False]
    inside = point_in_hull(np.array([[0.5, 0.5], [3, 3]]), sq)
    assert inside.tolist() == [True, False]


def test_binned_statistic_mean_std():
    from icepy4d_tpu.utils import binned_statistic

    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 4, (20000, 2))
    vals = xy[:, 0]  # value = x coordinate
    st = binned_statistic(xy, vals, step=1.0, bounds=[(0, 4), (0, 4)])
    assert st["mean"].shape == (4, 4)
    np.testing.assert_allclose(st["mean"][:, 0],
                               [0.5, 1.5, 2.5, 3.5], atol=0.05)
    np.testing.assert_allclose(st["std"], 1.0 / np.sqrt(12), atol=0.03)


def test_rototranslation_roundtrip():
    from icepy4d_tpu.utils import Rototranslation

    pts = np.array([[151.9, 99.0, 91.6], [0, 0, 0]], float)
    loc2utm = Rototranslation.belvedere_loc2utm()
    utm = loc2utm.transform(pts)
    assert utm[0, 0] > 4e5 and utm[0, 1] > 5e6
    back = Rototranslation.belvedere_utm2loc().transform(utm)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_least_squares_similarity():
    from icepy4d_tpu.least_squares import (
        compute_residuals, estimate_similarity_least_squares,
        get_T_from_params)

    rng = np.random.default_rng(2)
    x0 = rng.uniform(-10, 10, (50, 3))
    params = np.array([0.02, -0.01, 0.3, 5.0, -2.0, 1.0, 1.2])
    T_true = get_T_from_params(params)
    x1 = x0 @ T_true[:3, :3].T + T_true[:3, 3]

    r = compute_residuals(params, x0, x1)
    np.testing.assert_allclose(r, 0.0, atol=1e-3)

    T_est, rep = estimate_similarity_least_squares(x0, x1)
    np.testing.assert_allclose(T_est, T_true, atol=1e-3)
    assert rep["rmse"] < 1e-3


def test_tracking_time_series():
    from datetime import datetime

    from icepy4d_tpu.core import Epoch, Epoches
    from icepy4d_tpu.utils import (compute_displacements,
                                   tracked_points_time_series,
                                   tracked_time_series_to_df)

    eps = Epoches()
    for i in range(3):
        pts = Points()
        # track 1 moves +1 m/epoch in x; track 2 only in epochs 0-1
        coords = [[float(i), 0, 0], [5, 5, 5]] if i < 2 else \
            [[float(i), 0, 0]]
        ids = [1, 2] if i < 2 else [1]
        pts.append_points_from_numpy(np.asarray(coords, np.float32),
                                     track_ids=np.asarray(ids))
        eps.add_epoch(Epoch(timestamp=datetime(2022, 5, 1 + i),
                            points=pts), i)

    ser = tracked_points_time_series(eps, min_tracked_epoches=2)
    assert set(ser) == {1, 2}
    assert len(ser[1]) == 3 and len(ser[2]) == 2
    df = tracked_time_series_to_df(ser, eps)
    assert len(df) == 5
    disp = compute_displacements(ser)
    d1 = disp[disp.track_id == 1].iloc[0]
    assert abs(d1.displacement - 2.0) < 1e-6 and abs(d1.dx - 2.0) < 1e-6


def test_polyline_filter_and_mesh():
    from icepy4d_tpu.post_processing import (filter_pcd_by_polyline,
                                             mesh_from_dsm_grid)
    from icepy4d_tpu.utils import build_dsm

    rng = np.random.default_rng(3)
    pts = rng.uniform([0, 0, 0], [10, 10, 2], (2000, 3)).astype(np.float32)
    square = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)
    m = filter_pcd_by_polyline(pts, square, dir="x-y")
    inside = pts[m]
    assert m.sum() > 0
    assert inside[:, 0].min() >= 2 and inside[:, 0].max() <= 8
    assert inside[:, 1].min() >= 2 and inside[:, 1].max() <= 8
    # complement
    m2 = filter_pcd_by_polyline(pts, square, dir="x-y", keep_inside=False)
    assert (m ^ m2).all()

    dsm = build_dsm(pts, dsm_step=1.0, xlim=(0, 10), ylim=(0, 10))
    verts, faces = mesh_from_dsm_grid(dsm)
    assert len(verts) == 100
    assert len(faces) > 100
    assert faces.max() < len(verts)


def test_merge_point_clouds(tmp_path):
    from icepy4d_tpu.io.ply import write_ply
    from icepy4d_tpu.post_processing import read_and_merge_point_clouds

    rng = np.random.default_rng(4)
    p1 = rng.uniform(size=(50, 3)).astype(np.float32)
    p2 = rng.uniform(size=(30, 3)).astype(np.float32)
    c = rng.uniform(size=(50, 3)).astype(np.float32)
    write_ply(tmp_path / "a.ply", p1, rgb=c)
    write_ply(tmp_path / "b.ply", p2,
              rgb=rng.uniform(size=(30, 3)).astype(np.float32))
    pts, cols = read_and_merge_point_clouds(
        [tmp_path / "a.ply", tmp_path / "b.ply"])
    assert pts.shape == (80, 3)
    assert cols is not None and cols.shape == (80, 3)


def test_visualization_smoke(tmp_path):
    from icepy4d_tpu.visualization import (display_point_cloud,
                                           plot_matches, plot_matches_cv2,
                                           plot_projection_error)

    rng = np.random.default_rng(5)
    img = (rng.uniform(size=(100, 120)) * 255).astype(np.uint8)
    k0 = rng.uniform(0, [120, 100], (30, 2)).astype(np.float32)
    k1 = k0 + 2.0
    plot_matches(img, img, k0, k1, path=tmp_path / "m.png")
    plot_matches_cv2(img, img, k0, k1, path=str(tmp_path / "m2.png"))
    plot_projection_error(k0, k1, image=img, path=tmp_path / "e.png")
    pts = rng.uniform(size=(200, 3))
    display_point_cloud(pts, path=tmp_path / "pc.png")
    for f in ("m.png", "m2.png", "e.png", "pc.png"):
        assert (tmp_path / f).exists()


def test_homography_warping_stabilizes_rotation():
    from icepy4d_tpu.utils.homography import (homography_from_cameras,
                                              warp_image_to_reference,
                                              smooth_euler_angles)
    from icepy4d_tpu.ops.transforms import euler_matrix
    import jax.numpy as jnp

    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]],
                 np.float32)
    cam_ref = Camera.create(width=320, height=240, K=K)
    # camera rotated by 3 degrees about y
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = np.asarray(euler_matrix(jnp.asarray(0.0),
                                        jnp.asarray(np.deg2rad(3.0)),
                                        jnp.asarray(0.0)))
    cam_rot = Camera.create(width=320, height=240, K=K, extrinsics=E)

    H = homography_from_cameras(cam_ref, cam_rot)
    assert H.shape == (3, 3) and abs(H[2, 2] - 1) < 1e-6

    # render a synthetic rotated view of a textured plane and unwarp it
    rng = np.random.default_rng(0)
    import cv2

    lo = rng.uniform(size=(30, 40)).astype(np.float32)
    base = cv2.resize(lo, (320, 240), interpolation=cv2.INTER_CUBIC)
    rotated = cv2.warpPerspective(base, np.linalg.inv(H), (320, 240))
    unwarped = warp_image_to_reference(rotated, cam_rot, cam_ref)
    inner = (slice(40, 200), slice(60, 260))
    err = np.abs(unwarped[inner] - base[inner])
    assert np.median(err) < 0.03

    ang = np.array([[0, 0, 0], [0, 10, 0], [0, 0, 0]], float)
    sm = smooth_euler_angles(ang, window=1)
    assert sm[1, 1] == 0.0  # spike removed by median


def test_dem_of_difference_class(tmp_path):
    from icepy4d_tpu.post_processing import DemOfDifference

    g = np.stack(np.meshgrid(np.linspace(0.5, 9.5, 30),
                             np.linspace(0.5, 9.5, 30)), -1).reshape(-1, 2)
    p0 = np.concatenate([g, np.full((900, 1), 5.0)], 1)
    p1 = np.concatenate([g, np.full((900, 1), 4.0)], 1)  # 1 m melt
    dod = DemOfDifference(p0, p1, dsm_step=1.0)
    rep = dod.compute_volume()
    assert abs(rep.removed - 100.0) < 2.0 and rep.added < 1e-6
    dod.write_result_to_file(tmp_path / "vol.csv", label="2022-05")
    txt = (tmp_path / "vol.csv").read_text().splitlines()
    assert len(txt) == 2 and txt[1].startswith("2022-05")


def test_params_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    from icepy4d_tpu.models.convert import load_params, save_params
    from icepy4d_tpu.models.lightglue import LightGlue

    lg = LightGlue(n_layers=2)
    params = lg.init(0)
    save_params(tmp_path / "lg.npz", params)
    back = load_params(tmp_path / "lg.npz")
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2

    import jax

    leaves0 = jax.tree.leaves(params)
    leaves1 = jax.tree.leaves(back)
    assert len(leaves0) == len(leaves1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # loaded params drive the model identically
    rng = np.random.default_rng(0)
    data = {f"kpts{i}": jnp.asarray(
        rng.uniform(0, 100, (1, 16, 2)).astype(np.float32))
        for i in (0, 1)}
    for i in (0, 1):
        d = rng.normal(size=(1, 16, 256)).astype(np.float32)
        data[f"desc{i}"] = jnp.asarray(d)
        data[f"mask{i}"] = jnp.ones((1, 16), bool)
        data[f"size{i}"] = jnp.asarray([[100.0, 100.0]])
    o1 = lg.match(params, data)
    o2 = lg.match(jax.tree.map(jnp.asarray, back), data)
    np.testing.assert_allclose(np.asarray(o1["mscores0"]),
                               np.asarray(o2["mscores0"]), atol=1e-6)


def test_save_load_params_preserves_empty_dicts(tmp_path):
    """Review finding: LightGlue's identity input_proj ({}) vanished in
    the save/load round-trip, crashing the reloaded forward."""
    import numpy as np

    from icepy4d_tpu.models.convert import load_params, save_params

    params = {"input_proj": {}, "layers": [{"w": np.ones((2, 2))}],
              "assign": [{"b": np.zeros(3)}]}
    save_params(tmp_path / "p.npz", params)
    back = load_params(tmp_path / "p.npz")
    assert back["input_proj"] == {}
    np.testing.assert_array_equal(back["layers"][0]["w"], np.ones((2, 2)))
