"""Smoke tests for the CLI scripts (user workflows, SURVEY §2.11)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(args, cwd=REPO):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/tmp"}
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=300)


def test_build_and_update_dem_scripts(tmp_path):
    from icepy4d_tpu.io.ply import write_ply

    rng = np.random.default_rng(0)
    g = rng.uniform(0, 20, (4000, 2))
    for name, z in (("a.ply", 5.0), ("b.ply", 6.0)):
        pts = np.column_stack([g, np.full(len(g), z)]).astype(np.float32)
        write_ply(tmp_path / name, pts)
    r = _run(["scripts/build_dem.py", str(tmp_path / "a.ply"),
              "--step", "1.0", "--out", str(tmp_path / "a.npz")])
    assert r.returncode == 0, r.stderr
    r = _run(["scripts/build_dem.py", str(tmp_path / "b.ply"),
              "--step", "1.0", "--out", str(tmp_path / "b.npz")])
    assert r.returncode == 0, r.stderr
    r = _run(["scripts/update_dem.py", str(tmp_path / "a.npz"),
              str(tmp_path / "b.npz"), "--out", str(tmp_path / "m.npz")])
    assert r.returncode == 0, r.stderr
    assert "volume added" in r.stdout
    assert (tmp_path / "m.npz").exists()


def test_track_targets_script(tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    lo = rng.uniform(size=(40, 50)).astype(np.float32)
    base = cv2.resize(lo, (400, 320), interpolation=cv2.INTER_CUBIC)
    base = (base * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "master.jpg"), base)
    M = np.float32([[1, 0, 3], [0, 1, -2]])
    mv = cv2.warpAffine(base, M, (400, 320))
    cv2.imwrite(str(tmp_path / "slave_0.jpg"), mv)
    with open(tmp_path / "targets.csv", "w") as f:
        f.write("label,x,y\nT1,150,150\nT2,250,200\n")
    r = _run(["scripts/track_targets.py",
              "--master", str(tmp_path / "master.jpg"),
              "--images", str(tmp_path / "slave_*.jpg"),
              "--targets", str(tmp_path / "targets.csv"),
              "--out", str(tmp_path / "out"),
              "--template", "64", "--search", "96", "--snr", "3"])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "out" / "slave_0.csv").exists()


def test_finetune_lightglue_script(tmp_path):
    """End-to-end: epoch checkpoints -> correspondence fine-tune ->
    saved checkpoint (scripts/finetune_lightglue.py, tiny settings)."""
    import cv2

    from icepy4d_tpu.core.epoch import Epoch
    from icepy4d_tpu.core.features import Features
    from icepy4d_tpu.core.images import Image

    rng = np.random.default_rng(5)
    lo = rng.uniform(size=(30, 40)).astype(np.float32)
    base = cv2.resize(lo, (160, 120), interpolation=cv2.INTER_CUBIC)
    img0 = base[:112, :152]
    img1 = base[8:, 8:]
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    paths = {}
    for cam, img in (("cam1", img0), ("cam2", img1)):
        p = img_dir / f"{cam}.jpg"
        cv2.imwrite(str(p), (img * 255).astype(np.uint8))
        paths[cam] = p
    gx, gy = np.meshgrid(np.arange(20, 140, 10), np.arange(20, 100, 10))
    corr0 = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    corr1 = corr0 - 8.0
    keep = (corr1 > 4).all(1) & (corr1[:, 0] < 148) & (corr1[:, 1] < 104)
    corr0, corr1 = corr0[keep], corr1[keep]
    ids = np.arange(len(corr0), dtype=np.int32)
    ep = Epoch("2022-05-01 14:01:15",
               images={"cam1": Image(paths["cam1"]),
                       "cam2": Image(paths["cam2"])},
               features={"cam1": Features.from_numpy(corr0, track_ids=ids),
                         "cam2": Features.from_numpy(corr1, track_ids=ids)})
    ep_dir = tmp_path / "res" / "epochs" / ep.date_str
    ep_dir.mkdir(parents=True)
    ep.save_pickle(ep_dir / f"{ep.date_str}.pickle")

    out = tmp_path / "lg_ft.npz"
    r = _run(["scripts/finetune_lightglue.py",
              "--results-dir", str(tmp_path / "res"),
              "--steps", "4", "--batch", "2", "--n-batches", "2",
              "--eval-batches", "1", "--max-keypoints", "32",
              "--n-layers", "2", "--image-scale", "1.0",
              "--scan-chunk", "2", "--init", "",
              "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    # single pair -> no holdout possible; eval is labeled in-sample
    assert "IN-SAMPLE" in r.stdout and "after:" in r.stdout
    assert out.exists()
