"""COLMAP binary/text model IO + database (io/colmap.py).

Byte-level format compatibility is verified against the reference's
vendored COLMAP scripts (read-only oracle:
/root/reference/src/icepy4d/io/colmap_utils/read_write_model.py) — a
model written by our numpy-vectorized writers must read back
identically through the official implementation, and vice versa.
"""

import sys

import numpy as np
import pytest

from icepy4d_tpu.io.colmap import (COLMAPDatabase, ColmapCamera,
                                   ColmapImage, ColmapPoint3D,
                                   image_ids_to_pair_id,
                                   pair_id_to_image_ids, qvec2rotmat,
                                   read_model, rotmat2qvec, write_model)

ORACLE_PATH = "/root/reference/src/icepy4d/io/colmap_utils"


def _model():
    rng = np.random.default_rng(0)
    cams = {
        1: ColmapCamera(1, "OPENCV", 6012, 4008,
                        rng.uniform(0.1, 2000, 8)),
        2: ColmapCamera(2, "PINHOLE", 640, 480,
                        np.asarray([500.0, 500.0, 320.0, 240.0])),
    }
    imgs = {}
    for i in (1, 2):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        n = 5 if i == 1 else 0
        imgs[i] = ColmapImage(
            i, q * np.sign(q[0]), rng.normal(size=3), i, f"IMG_{i}.jpg",
            rng.uniform(0, 640, (n, 2)),
            np.asarray([-1, 3, -1, 7, 9][:n], np.int64))
    pts = {
        3: ColmapPoint3D(3, rng.normal(size=3), np.asarray(
            [10, 200, 30], np.uint8), 0.5,
            np.asarray([1, 2], np.int32), np.asarray([1, 0], np.int32)),
        7: ColmapPoint3D(7, rng.normal(size=3), np.asarray(
            [1, 2, 3], np.uint8), 1.25,
            np.asarray([1], np.int32), np.asarray([3], np.int32)),
    }
    return cams, imgs, pts


def _assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert set(ca) == set(cb) and set(ia) == set(ib) and set(pa) == set(pb)
    for k in ca:
        assert ca[k].model == cb[k].model
        assert (ca[k].width, ca[k].height) == (cb[k].width, cb[k].height)
        np.testing.assert_allclose(ca[k].params, cb[k].params, rtol=1e-12)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec, rtol=1e-12)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec, rtol=1e-12)
        assert ia[k].name == ib[k].name
        assert ia[k].camera_id == ib[k].camera_id
        np.testing.assert_allclose(np.asarray(ia[k].xys, float),
                                   np.asarray(ib[k].xys, float),
                                   rtol=1e-12)
        np.testing.assert_array_equal(ia[k].point3D_ids,
                                      ib[k].point3D_ids)
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz, rtol=1e-12)
        np.testing.assert_array_equal(pa[k].rgb, pb[k].rgb)
        assert pa[k].error == pytest.approx(pb[k].error)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)
        np.testing.assert_array_equal(pa[k].point2D_idxs,
                                      pb[k].point2D_idxs)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_model_roundtrip(tmp_path, ext):
    m = _model()
    write_model(*m, tmp_path, ext=ext)
    _assert_models_equal(m, read_model(tmp_path, ext=ext))


def test_binary_model_read_by_official_oracle(tmp_path):
    """Our writers' bytes parse identically through COLMAP's own
    (reference-vendored) reader."""
    sys.path.insert(0, ORACLE_PATH)
    try:
        import read_write_model as oracle
    finally:
        sys.path.remove(ORACLE_PATH)

    m = _model()
    write_model(*m, tmp_path, ext=".bin")
    cams = oracle.read_cameras_binary(tmp_path / "cameras.bin")
    imgs = oracle.read_images_binary(tmp_path / "images.bin")
    pts = oracle.read_points3D_binary(tmp_path / "points3D.bin")
    assert set(cams) == {1, 2} and cams[1].model == "OPENCV"
    np.testing.assert_allclose(cams[1].params, m[0][1].params)
    np.testing.assert_allclose(imgs[1].qvec, m[1][1].qvec)
    np.testing.assert_allclose(imgs[1].xys, m[1][1].xys)
    np.testing.assert_array_equal(imgs[1].point3D_ids,
                                  m[1][1].point3D_ids)
    assert imgs[2].name == "IMG_2.jpg" and len(imgs[2].xys) == 0
    np.testing.assert_allclose(pts[3].xyz, m[2][3].xyz)
    np.testing.assert_array_equal(pts[3].image_ids, m[2][3].image_ids)


def test_binary_model_written_by_official_oracle_reads_back(tmp_path):
    sys.path.insert(0, ORACLE_PATH)
    try:
        import read_write_model as oracle
    finally:
        sys.path.remove(ORACLE_PATH)

    cams, imgs, pts = _model()
    o_cams = {k: oracle.Camera(id=v.id, model=v.model, width=v.width,
                               height=v.height, params=v.params)
              for k, v in cams.items()}
    o_imgs = {k: oracle.Image(id=v.id, qvec=v.qvec, tvec=v.tvec,
                              camera_id=v.camera_id, name=v.name,
                              xys=v.xys, point3D_ids=v.point3D_ids)
              for k, v in imgs.items()}
    o_pts = {k: oracle.Point3D(id=v.id, xyz=v.xyz, rgb=v.rgb,
                               error=v.error, image_ids=v.image_ids,
                               point2D_idxs=v.point2D_idxs)
             for k, v in pts.items()}
    oracle.write_cameras_binary(o_cams, tmp_path / "cameras.bin")
    oracle.write_images_binary(o_imgs, tmp_path / "images.bin")
    oracle.write_points3D_binary(o_pts, tmp_path / "points3D.bin")
    _assert_models_equal((cams, imgs, pts), read_model(tmp_path, ".bin"))


def _import_oracle():
    sys.path.insert(0, ORACLE_PATH)
    try:
        import read_write_model as oracle
    finally:
        sys.path.remove(ORACLE_PATH)
    return oracle


ALL_MODELS = ["SIMPLE_PINHOLE", "PINHOLE", "SIMPLE_RADIAL", "RADIAL",
              "OPENCV", "OPENCV_FISHEYE", "FULL_OPENCV", "FOV",
              "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE",
              "THIN_PRISM_FISHEYE"]


@pytest.mark.parametrize("model", ALL_MODELS)
def test_all_camera_models_oracle_roundtrip(tmp_path, model):
    """Every COLMAP camera model round-trips byte-identically through
    the official (reference-vendored) reader AND writer — catches
    param-count table bugs (SIMPLE_RADIAL=4, RADIAL=5 per spec,
    ref io/colmap_utils/read_write_model.py:56-68)."""
    oracle = _import_oracle()
    n_params = oracle.CAMERA_MODEL_NAMES[model].num_params
    from icepy4d_tpu.io.colmap import CAMERA_MODELS, CAMERA_MODEL_IDS
    assert CAMERA_MODELS[CAMERA_MODEL_IDS[model]][1] == n_params

    rng = np.random.default_rng(hash(model) % 2 ** 31)
    # Two cameras: a desync in record length for cam 1 corrupts cam 2.
    cams = {1: ColmapCamera(1, model, 800, 600,
                            rng.uniform(0.1, 900, n_params)),
            2: ColmapCamera(2, "PINHOLE", 64, 48,
                            np.asarray([50.0, 50.0, 32.0, 24.0]))}

    # ours -> oracle
    write_model(cams, {}, {}, tmp_path, ext=".bin")
    got = oracle.read_cameras_binary(tmp_path / "cameras.bin")
    assert got[1].model == model and len(got[1].params) == n_params
    np.testing.assert_allclose(got[1].params, cams[1].params)
    np.testing.assert_allclose(got[2].params, cams[2].params)

    # oracle -> ours
    o_cams = {k: oracle.Camera(id=v.id, model=v.model, width=v.width,
                               height=v.height, params=v.params)
              for k, v in cams.items()}
    oracle.write_cameras_binary(o_cams, tmp_path / "cameras2.bin")
    (tmp_path / "cameras2.bin").replace(tmp_path / "cameras.bin")
    oracle.write_images_binary({}, tmp_path / "images.bin")
    oracle.write_points3D_binary({}, tmp_path / "points3D.bin")
    back, _, _ = read_model(tmp_path, ".bin")
    assert back[1].model == model and len(back[1].params) == n_params
    np.testing.assert_allclose(back[1].params, cams[1].params)
    np.testing.assert_allclose(back[2].params, cams[2].params)

    # ours <-> ours, both formats
    for ext in (".bin", ".txt"):
        write_model(cams, {}, {}, tmp_path, ext=ext)
        rb, _, _ = read_model(tmp_path, ext)
        np.testing.assert_allclose(rb[1].params, cams[1].params,
                                   rtol=1e-12)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) or 1.0
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (2, 1), (7, 7), (1, 2 ** 31 - 2)]:
        pid = image_ids_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_ids(pid) == (lo, hi)


def test_database_roundtrip(tmp_path):
    db = COLMAPDatabase.connect(tmp_path / "db.db")
    cam = db.add_camera("OPENCV", 640, 480,
                        [500, 500, 320, 240, 0, 0, 0, 0])
    i1 = db.add_image("a.jpg", cam)
    i2 = db.add_image("b.jpg", cam)
    rng = np.random.default_rng(0)
    k1 = rng.uniform(0, 640, (30, 2)).astype(np.float32)
    db.add_keypoints(i1, k1)
    db.add_keypoints(i2, rng.uniform(0, 640, (25, 2)))
    m = np.stack([np.arange(10), np.arange(10) + 5], 1)
    db.add_matches(i1, i2, m)
    db.add_two_view_geometry(i1, i2, m)
    db.commit()

    got = db.read_keypoints(i1)
    assert got.shape == (30, 4)  # padded to x,y,scale,orientation
    np.testing.assert_allclose(got[:, :2], k1)
    np.testing.assert_array_equal(db.read_matches(i1, i2), m)
    np.testing.assert_array_equal(db.read_matches(i2, i1),
                                  m[:, ::-1])
    db.close()


def test_database_read_by_official_oracle(tmp_path):
    """Blobs written by us parse through the reference-vendored
    database helpers (pair-id convention + blob layout)."""
    sys.path.insert(0, ORACLE_PATH)
    if not hasattr(np, "NaN"):
        np.NaN = np.nan  # oracle predates numpy 2.0
    try:
        import database as oracle_db
    finally:
        sys.path.remove(ORACLE_PATH)
        if np.NaN is np.nan:
            del np.NaN

    db = COLMAPDatabase.connect(tmp_path / "db.db")
    cam = db.add_camera(4, 640, 480, [500, 500, 320, 240, 0, 0, 0, 0])
    i1 = db.add_image("a.jpg", cam)
    i2 = db.add_image("b.jpg", cam)
    m = np.stack([np.arange(8), np.arange(8) + 3], 1)
    db.add_matches(i1, i2, m)
    db.commit()
    db.close()

    odb = oracle_db.COLMAPDatabase.connect(str(tmp_path / "db.db"))
    rows = odb.execute("SELECT pair_id, rows, cols, data "
                       "FROM matches").fetchall()
    assert len(rows) == 1
    pid, r, c, blob = rows[0]
    assert pid == image_ids_to_pair_id(i1, i2)
    got = oracle_db.blob_to_array(blob, np.uint32, (r, c))
    np.testing.assert_array_equal(got, m)
    odb.close()


def test_export_solution_binary_and_database(tmp_path, assets_dir):
    from icepy4d_tpu.core import Calibration
    from icepy4d_tpu.core.points import Points
    from icepy4d_tpu.io.export2colmap import (
        export_solution_to_colmap_binary, export_to_colmap_database)

    cam1 = Calibration(assets_dir / "calib" / "cam1.txt").to_camera()
    cam2 = Calibration(assets_dir / "calib" / "cam2.txt").to_camera()
    pts = Points()
    rng = np.random.default_rng(1)
    pts.append_points_from_numpy(
        rng.normal(size=(20, 3)).astype(np.float32),
        track_ids=np.arange(20))

    class _Img:
        def __init__(self, name):
            self.name = name

    imdict = {"cam1": _Img("a.jpg"), "cam2": _Img("b.jpg")}
    out = export_solution_to_colmap_binary(
        tmp_path / "sparse", imdict,
        {"cam1": cam1, "cam2": cam2}, points=pts)
    cams, imgs, p3d = read_model(out, ".bin")
    assert len(cams) == 2 and len(imgs) == 2 and len(p3d) == 20

    dbp = export_to_colmap_database(
        tmp_path / "db.db", imdict,
        {"cam1": cam1, "cam2": cam2})
    assert dbp.exists()
