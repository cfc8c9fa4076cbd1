"""Multi-camera (n=3) pipeline on a synthetic rig.

Beyond the reference (stereo-only): a master + 2 slaves viewing a
textured fronto-plane, with surveyed centers and GCP targets. Ground
truth is known, so the full chain (multicam matching -> per-slave
orientation -> triangulation -> AO -> grid BA) is checked numerically.
"""

import os
import time
from pathlib import Path

import numpy as np
import pytest

from icepy4d_tpu.utils.config import DotDict

H, W = 240, 320
F = 400.0
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
Z = 10.0

CENTERS = np.array([[0.0, 0.0, 0.0],
                    [1.0, 0.1, 0.0],
                    [-0.8, 0.05, 0.1]], np.float32)


def _extrinsics(ctr):
    """Look roughly at the plane center (0, 0, Z)."""
    at = np.array([0.0, 0.0, Z])
    z = at - ctr
    z /= np.linalg.norm(z)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = -R @ ctr
    return E


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("rig")
    rng = np.random.default_rng(5)
    tex = np.zeros((H * 3, W * 3), np.float32)
    for cell in (8, 16, 32):
        lo = rng.uniform(size=(H * 3 // cell + 1, W * 3 // cell + 1))
        tex += cv2.resize(lo.astype(np.float32), (W * 3, H * 3),
                          interpolation=cv2.INTER_CUBIC)
    tex = (tex - tex.min()) / np.ptp(tex)

    ys, xs = np.mgrid[0:H, 0:W]

    def render(E):
        R = E[:3, :3]
        C = -R.T @ E[:3, 3]
        rays = np.stack([(xs - K[0, 2]) / F, (ys - K[1, 2]) / F,
                         np.ones_like(xs, np.float32)], -1) @ R
        s = (Z - C[2]) / rays[..., 2]
        X = C + s[..., None] * rays
        u = (X[..., 0] + 5.0) / 10.0 * (W * 3 - 1)
        v = (X[..., 1] + 4.0) / 8.0 * (H * 3 - 1)
        return cv2.remap(tex, u.astype(np.float32),
                         v.astype(np.float32), cv2.INTER_LINEAR)

    extr = [_extrinsics(c) for c in CENTERS]
    cams = ["cam1", "cam2", "cam3"]
    targets_world = np.array([[-2.0, -1.5, Z], [2.0, -1.0, Z],
                              [0.0, 1.5, Z], [-1.0, 1.0, Z]], np.float32)
    tdir = root / "targets"
    tdir.mkdir()
    with open(tdir / "target_world.csv", "w") as f:
        f.write("label,X,Y,Z\n")
        for i, (x, y, z) in enumerate(targets_world):
            f.write(f"T{i},{x},{y},{z}\n")

    ts = time.time()
    for ci, (cam, E) in enumerate(zip(cams, extr)):
        d = root / "img" / cam
        d.mkdir(parents=True)
        img = (render(E) * 255).astype(np.uint8)
        p = d / f"IMG_{ci}00.png"
        cv2.imwrite(str(p), img)
        os.utime(p, (ts + ci, ts + ci))  # within sync tolerance
        # per-image target observations (project world targets)
        R, t = E[:3, :3], E[:3, 3]
        pc = targets_world @ R.T + t
        uv = (pc[:, :2] / pc[:, 2:]) * [F, F] + [K[0, 2], K[1, 2]]
        with open(tdir / f"IMG_{ci}00.csv", "w") as f:
            f.write("label,x,y\n")
            for i, (u, v) in enumerate(uv):
                f.write(f"T{i},{u:.4f},{v:.4f}\n")
        # calibration
        (root / "calib").mkdir(exist_ok=True)
        with open(root / "calib" / f"{cam}.txt", "w") as f:
            f.write(f"{W} {H} {F} 0. {W/2} 0. {F} {H/2} 0. 0. 1. "
                    "0. 0. 0. 0.\n")
    return root, extr


class GroundTruthMatcher:
    """Stub matcher issuing exact correspondences of a known 3-D scene
    (random-weight learned matchers cannot produce reliable cross-view
    matches in CI; this isolates the multicam ORCHESTRATION under test).
    Master keypoints are identical across calls, as with a real
    deterministic extractor."""

    def __init__(self, extr):
        rng = np.random.default_rng(9)
        # non-planar scene: two depth layers (planar sets degenerate the
        # 8-point essential estimate)
        pts = np.concatenate([
            rng.uniform([-3, -2.2, 9.4], [3, 2.2, 10.0], (120, 3)),
            rng.uniform([-2.5, -2, 11.0], [2.5, 2, 12.5], (120, 3)),
        ]).astype(np.float32)
        self._scene = pts
        self._extr = extr
        self._noise = rng
        self._call = 0

    def _project(self, E):
        R, t = E[:3, :3], E[:3, 3]
        pc = self._scene @ R.T + t
        uv = (pc[:, :2] / pc[:, 2:]) * [F, F] + [K[0, 2], K[1, 2]]
        inb = ((uv[:, 0] > 5) & (uv[:, 0] < W - 5)
               & (uv[:, 1] > 5) & (uv[:, 1] < H - 5))
        return uv, inb

    descriptor_dim = 32

    def match(self, im0, im1, **kw):
        # which slave? images are rendered per camera; track call order
        self._call += 1
        uv0, in0 = self._project(self._extr[0])
        uv1, in1 = self._project(self._extr[self._call])
        ok = in0 & in1
        self.mkpts0 = uv0[ok].astype(np.float32)
        self.mkpts1 = (uv1[ok] + self._noise.normal(0, 0.2, (ok.sum(), 2))
                       ).astype(np.float32)
        # deterministic per-scene-point descriptors (id encodings), as a
        # real extractor would give stable descriptors per 3-D point
        ids = np.where(ok)[0]
        d = np.zeros((len(ids), self.descriptor_dim), np.float32)
        d[np.arange(len(ids)), ids % self.descriptor_dim] = 1.0
        self.descriptors0 = d.T.copy()
        self.descriptors1 = d.T.copy()
        self.scores0 = np.ones(len(ids), np.float32)
        self.scores1 = np.ones(len(ids), np.float32)
        return True


def test_multicam_pipeline_recovers_geometry(rig, tmp_path):
    from icepy4d_tpu import Pipeline

    root, extr = rig
    cfg = DotDict.wrap({
        "paths": {"image_dir": str(root / "img"),
                  "calibration_dir": str(root / "calib"),
                  "results_dir": str(tmp_path)},
        "proc": {"epoch_to_process": [0], "do_tracking": False,
                 "do_ba": True, "save_checkpoints": False,
                 "use_mtime_fallback": True},
        "georef": {
            "camera_centers_world": CENTERS,
            "target_dir": str(root / "targets"),
            "target_world_file": "target_world.csv",
            "targets_to_use": ["T0", "T1", "T2", "T3"],
        },
        "other": {"pydegensac_threshold": 2.0},
        "matching": {"matcher": "nn", "quality": "high",
                     "tile_selection": "none", "max_keypoints": 1024,
                     "options": {"distance_threshold": 0.85}},
        "ba": {"camera_location_accuracy": 0.05, "fit_f": False,
               "max_iters": 60},
    })
    pipe = Pipeline(cfg)
    assert len(pipe.cams) == 3
    pipe.matcher = GroundTruthMatcher(extr)
    epoches = pipe.run()
    ep = epoches[0]

    # all three cameras got features; master has the superset
    n_master = len(ep.features["cam1"])
    assert n_master > 30
    for c in ("cam2", "cam3"):
        assert 0 < len(ep.features[c]) <= n_master

    # camera centers recovered near the surveyed values
    for c, ctr in zip(("cam1", "cam2", "cam3"), CENTERS):
        got = np.asarray(ep.cameras[c].C).ravel()
        np.testing.assert_allclose(got, ctr, atol=0.15)

    # triangulated points land near the true scene depths
    pts = ep.points.to_numpy()
    assert len(pts) > 30
    in_band = (pts[:, 2] > 9.0) & (pts[:, 2] < 13.0)
    assert in_band.mean() > 0.85

    # CSV sinks written
    assert (tmp_path / "residuals_image.csv").exists()
    assert (tmp_path / "estimated_cameras.csv").exists()


def test_multicam_temporal_tracking_wiring(rig, tmp_path, monkeypatch):
    """Epoch t>0 seeds track_matches with ALL cameras' previous features
    and appends the survivors (old track ids) to every camera."""
    from icepy4d_tpu import Pipeline
    from icepy4d_tpu import pipeline as pipeline_mod
    from icepy4d_tpu.core.features import Features

    root, extr = rig
    # second epoch: same images, one hour later
    import shutil
    for cam in ("cam1", "cam2", "cam3"):
        d = root / "img" / cam
        srcs = sorted(d.glob("IMG_*00.png"))
        src = srcs[0]
        dst = d / src.name.replace("00", "01")
        if not dst.exists():
            shutil.copy(src, dst)
        os.utime(dst, (os.path.getmtime(src) + 3600,
                       os.path.getmtime(src) + 3600))

    calls = {}

    def fake_track_matches(matcher, prev_features, new_images, **kw):
        calls["cams"] = sorted(prev_features)
        calls["imgs"] = sorted(new_images)
        out = {}
        for c, f in prev_features.items():
            ids = f.track_ids_to_numpy()[:7]
            feats = Features(descr_dim=f.descr_dim)
            feats.append_features_from_numpy(
                np.full((7, 2), 3.0, np.float32),
                descr=np.zeros((7, f.descr_dim), np.float32),
                scores=np.ones(7, np.float32), track_ids=ids)
            out[c] = feats
        return out

    monkeypatch.setattr(pipeline_mod, "track_matches", fake_track_matches)

    cfg = DotDict.wrap({
        "paths": {"image_dir": str(root / "img"),
                  "calibration_dir": str(root / "calib"),
                  "results_dir": str(tmp_path)},
        "proc": {"epoch_to_process": [0, 1], "do_tracking": True,
                 "do_ba": False, "save_checkpoints": False,
                 "use_mtime_fallback": True},
        "georef": {
            "camera_centers_world": CENTERS,
            "target_dir": str(root / "targets"),
            "target_world_file": "target_world.csv",
            "targets_to_use": ["T0", "T1", "T2", "T3"],
        },
        "other": {"pydegensac_threshold": 2.0},
        "matching": {"matcher": "nn", "quality": "high",
                     "tile_selection": "none", "max_keypoints": 1024},
    })
    pipe = Pipeline(cfg)
    pipe.matcher = GroundTruthMatcher(extr + extr)
    epoches = pipe.run()

    assert calls["cams"] == ["cam1", "cam2", "cam3"]
    assert calls["imgs"] == ["cam1", "cam2", "cam3"]
    ep0, ep1 = epoches[0], epoches[1]
    for c in ("cam1", "cam2", "cam3"):
        ids0 = set(ep0.features[c].track_ids_to_numpy().tolist())
        ids1 = set(ep1.features[c].track_ids_to_numpy().tolist())
        # 7 tracked ids from epoch 0 survive into epoch 1
        assert len(ids0 & ids1) == 7
