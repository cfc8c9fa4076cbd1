"""Core data model tests (model: reference tests/test_features.py,
test_image.py, test_point_cloud.py)."""

import numpy as np
import pytest

from icepy4d_tpu.core import (
    Calibration,
    Camera,
    Epoch,
    EpochDataMap,
    Epoches,
    Features,
    FeatureSet,
    ImageDS,
    PointCloud,
    Points,
    Targets,
)


def test_camera_roundtrip():
    K = np.array([[1000.0, 0, 500], [0, 1000, 400], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    cam = Camera.create(width=1000, height=800, K=K,
                        extrinsics=Camera.Rt_to_extrinsics(R, t))
    np.testing.assert_allclose(np.asarray(cam.C), -t, atol=1e-6)
    pose = np.asarray(cam.pose)
    ext = np.asarray(Camera.pose_to_extrinsics(pose))
    np.testing.assert_allclose(ext, np.asarray(cam.extrinsics), atol=1e-6)
    # P = K [R|t]
    np.testing.assert_allclose(
        np.asarray(cam.P), K @ np.hstack([R, t[:, None]]), atol=1e-4
    )


def test_camera_factor_P():
    rng = np.random.default_rng(0)
    K = np.array([[1200.0, 0, 600], [0, 1100, 450], [0, 0, 1]], np.float32)
    # random rotation
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3).astype(np.float32)
    cam = Camera.create(K=K, extrinsics=Camera.Rt_to_extrinsics(Q, t))
    K2, R2, t2 = (np.asarray(x) for x in cam.factor_P())
    np.testing.assert_allclose(K2, K / K[2, 2], atol=1e-3)
    np.testing.assert_allclose(R2, Q, atol=1e-4)
    np.testing.assert_allclose(t2, t, atol=1e-3)


def test_calibration_parse(calib_file):
    calib = Calibration(calib_file)
    assert calib.width == 6012 and calib.height == 4008
    assert abs(calib.K[0, 0] - 6621.74345720628298) < 1e-6
    cam = calib.to_camera()
    assert cam.width == 6012
    assert np.asarray(cam.dist).shape == (8,)


def test_features_append_and_filter():
    f = Features(descr_dim=4)
    xy = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    descr = np.arange(12, dtype=np.float32).reshape(3, 4)
    f.append_features_from_numpy(xy, descr=descr, scores=[0.5, 0.6, 0.7])
    assert len(f) == 3
    assert f.last_track_id == 2
    # collision -> progressive re-assignment (ref features.py:417-425)
    f.append_features_from_numpy(xy, track_ids=[0, 1, 2])
    assert len(f) == 6
    assert f.last_track_id == 5
    f.filter_feature_by_mask([True, False, True, False, True, False])
    assert len(f) == 3
    np.testing.assert_allclose(f.kpts_to_numpy()[:, 0], [1.0, 5.0, 3.0])


def test_features_transposed_descriptors():
    # reference stores (D, N); both layouts must be accepted
    f = Features(descr_dim=8)
    f.append_features_from_numpy(np.zeros((5, 2)), descr=np.zeros((8, 5)))
    assert f.descr_to_numpy().shape == (5, 8)


def test_featureset_padding():
    fs = FeatureSet.from_arrays(np.array([[1.0, 2.0], [3.0, 4.0]]),
                                capacity=8, descr_dim=16)
    assert fs.capacity == 8
    assert int(fs.num_valid) == 2
    back = fs.compact()
    assert len(back) == 2


def test_points_and_cloud(tmp_path):
    p = Points()
    xyz = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    p.append_points_from_numpy(xyz, colors=np.full((50, 3), 0.5))
    assert len(p) == 50
    pc = p.to_point_cloud()
    out = tmp_path / "cloud.ply"
    pc.write_ply(out)
    pc2 = PointCloud(pcd_path=out)
    np.testing.assert_allclose(pc2.get_points(), xyz, atol=1e-5)
    assert pc2.get_colors().shape == (50, 3)


def test_sor_filter():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(200, 3)).astype(np.float32)
    xyz[0] = [100.0, 100.0, 100.0]  # gross outlier
    pc = PointCloud(points3d=xyz)
    pc.sor_filter(nb_neighbors=10, std_ratio=2.0)
    assert len(pc) < 200
    assert not np.any(np.all(pc.get_points() == [100.0, 100.0, 100.0], axis=1))


def test_targets(assets_dir):
    t = Targets(
        im_file_path=[
            assets_dir / "targets" / "IMG_2637.csv",
            assets_dir / "targets" / "IMG_1112.csv",
        ],
        obj_file_path=assets_dir / "targets" / "target_world.csv",
    )
    coords, found = t.get_image_coor_by_label(["F2", "NOPE"], cam_id=0)
    assert found == ["F2"]
    np.testing.assert_allclose(coords[0], [4002.709, 3543.0627], atol=1e-3)
    obj, found = t.get_object_coor_by_label(["F2", "F11"])
    assert found == ["F2", "F11"]
    assert obj.shape == (2, 3)


def test_imageds_and_exif(assets_dir):
    ds = ImageDS(assets_dir / "img" / "cam1")
    assert len(ds) == 4
    im = ds[0]
    assert im.width == 1200 and im.height == 800
    assert im.date is not None  # EXIF DateTime parsed
    assert im.value.shape == (800, 1200, 3)
    patch = im.extract_patch((10, 20, 110, 90))
    assert patch.shape == (70, 100, 3)


def test_epoch_map_and_pickle(assets_dir, tmp_path):
    edm = EpochDataMap(assets_dir / "img", time_tolerance_sec=1200,
                       write_csv=False)
    assert len(edm) >= 1
    imgs = edm.get_images(0)
    assert set(imgs) == {"cam1", "cam2"}

    ep = Epoch(edm.get_timestamp(0), images=imgs, epoch_dir=tmp_path)
    path = ep.save_pickle()
    ep2 = Epoch.read_pickle(path)
    assert ep2.timestamp == ep.timestamp

    eps = Epoches()
    eid = eps.add_epoch(ep)
    assert eps.get_epoch_id(ep.timestamp) == eid
    assert eps.get_epoch_by_date(ep.timestamp) is ep


def test_read_xml_calibration_opencv_filestorage(tmp_path):
    """OpenCV FileStorage layout (review finding: width/height/dist were
    silently zero)."""
    from icepy4d_tpu.core.calibration import read_xml_calibration

    xml = """<?xml version="1.0"?>
<opencv_storage>
  <image_Width>6012</image_Width>
  <image_Height>4008</image_Height>
  <Camera_Matrix type_id="opencv-matrix">
    <rows>3</rows><cols>3</cols><dt>d</dt>
    <data>6600. 0. 3006. 0. 6600. 2004. 0. 0. 1.</data>
  </Camera_Matrix>
  <Distortion_Coefficients type_id="opencv-matrix">
    <rows>5</rows><cols>1</cols><dt>d</dt>
    <data>-0.12 0.09 1.0e-04 -2.0e-04 0.01</data>
  </Distortion_Coefficients>
</opencv_storage>"""
    p = tmp_path / "cal.xml"
    p.write_text(xml)
    w, h, K, dist = read_xml_calibration(p)
    assert (w, h) == (6012, 4008)
    np.testing.assert_allclose(K[0, 0], 6600.0)
    np.testing.assert_allclose(K[0, 2], 3006.0)
    np.testing.assert_allclose(dist[:5],
                               [-0.12, 0.09, 1e-4, -2e-4, 0.01])


def test_sensor_width_database_bundled_openmvg():
    """The full openMVG CSV (~3,600 rows) is bundled; cameras absent
    from the legacy 10-entry override table must resolve (ref
    thirdparty/CameraSensorSizeDatabase/sensor_database.csv)."""
    from icepy4d_tpu.core.sensor_width_database import (
        SensorWidthDatabase, _BUILTIN)

    db = SensorWidthDatabase()
    assert len(db.table) > 3000
    # Rows straight from the openMVG CSV, none in _BUILTIN:
    for make, model, width in [
        ("Acer", "Acer CE-5330", 5.75),
        ("Canon", "Canon EOS 5D Mark II", 36.0),
        ("Nikon", "Nikon D90", 23.6),
        ("Panasonic", "Panasonic Lumix DMC-GH3", 17.3),
    ]:
        assert (make.lower(), model.lower()) not in _BUILTIN
        assert db.lookup(make, model) == width
    # Substring fallback: EXIF often gives Make="NIKON CORPORATION".
    assert db.lookup("NIKON CORPORATION", "NIKON D90") == 23.6
    # Override table still wins for the modern bodies it pins.
    assert db.lookup("Canon", "Canon EOS 2000D") == 22.3
