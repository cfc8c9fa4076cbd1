"""Glaciology analysis products (post_processing/analysis.py) +
their CLI scripts.

Synthetic ground-truth scenes: a vertical glacier front with a known
top border, known melt between epochs, known voxel occupancy — the
reference's CloudCompare/open3d scripts (scripts/pcd_postprocessing/)
have no tests at all.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _front_scene(n=4000, seed=0):
    """Horizontal plateau at z=100 meeting a vertical face at x=50:
    the 'top border' is the fold line x=50, z=100."""
    rng = np.random.default_rng(seed)
    n_top = n // 2
    top = np.stack([
        rng.uniform(0, 50, n_top),            # x on the plateau
        rng.uniform(0, 30, n_top),            # y
        np.full(n_top, 100.0) + rng.normal(0, 0.05, n_top),
    ], 1)
    n_face = n - n_top
    face = np.stack([
        np.full(n_face, 50.0) + rng.normal(0, 0.05, n_face),
        rng.uniform(0, 30, n_face),
        rng.uniform(60, 100, n_face),         # vertical wall
    ], 1)
    return np.concatenate([top, face]).astype(np.float32)


def test_geometric_features_plane_vs_wall():
    from icepy4d_tpu.post_processing import geometric_features

    pts = _front_scene()
    f = geometric_features(pts, k=24)
    top = pts[:, 2] > 99.5
    wall = (pts[:, 0] > 49.5) & (pts[:, 2] < 95)
    # plateau normals point up -> low verticality; wall -> high
    assert np.median(f["verticality"][top]) < 0.2
    assert np.median(f["verticality"][wall]) > 0.8
    # both are planar surfaces
    assert np.median(f["planarity"][top]) > 0.5
    assert np.median(f["planarity"][wall]) > 0.5


def test_detect_border_finds_fold_line():
    from icepy4d_tpu.post_processing import (border_statistics,
                                             detect_border)

    pts = _front_scene(n=6000)
    mask = detect_border(pts, k=24,
                         linearity_percentile=(80, 100),
                         verticality_percentile=(50, 100),
                         z_percentile=(50, 100))
    border = pts[mask]
    assert len(border) > 20
    st = border_statistics(border, x_halfwidth=10.0)
    # the fold line sits at x=50, z in the upper face band
    assert abs(st["x_median"] - 50.0) < 2.0
    assert st["z_median"] > 90.0


def test_border_time_series_csv(tmp_path):
    from icepy4d_tpu.post_processing import (border_statistics,
                                             write_border_time_series)

    rows = [("a.ply", "2022_05_01",
             border_statistics(_front_scene()[:100])),
            ("b.ply", "2022_05_06",
             border_statistics(_front_scene(seed=1)[:100]))]
    p = write_border_time_series(rows, tmp_path / "coords.txt")
    lines = p.read_text().splitlines()
    assert lines[0].startswith("pcd_name,date,x_mean")
    assert len(lines) == 3
    assert lines[1].split(",")[1] == "2022_05_01"


def test_extract_sections_and_plot(tmp_path):
    from icepy4d_tpu.post_processing import (extract_section,
                                             extract_sections,
                                             plot_sections)

    pts = _front_scene()
    sec = extract_section(pts, "y", 15.0, thickness=2.0)
    assert len(sec) > 50
    assert np.all(np.abs(sec[:, 1] - 15.0) <= 1.0)
    secs = extract_sections(pts, "y", [5.0, 15.0, 25.0], thickness=2.0)
    assert set(secs) == {5.0, 15.0, 25.0}
    fig = plot_sections(secs, out=tmp_path / "sections.png")
    assert (tmp_path / "sections.png").stat().st_size > 10_000
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_voxelize_counts_and_centers():
    from icepy4d_tpu.post_processing import voxelize

    # 8 points, one per corner of a 2x2x2 voxel block
    pts = np.array([[x + 0.5, y + 0.5, z + 0.5]
                    for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                   np.float32)
    cols = np.tile(np.array([[255, 0, 0]], np.float32), (8, 1))
    grid = voxelize(pts, cols, voxel_size=1.0,
                    bb_min=[0, 0, 0], bb_max=[2, 2, 2])
    assert len(grid.centers) == 8
    assert grid.counts.sum() == 8
    np.testing.assert_allclose(sorted(grid.centers[:, 0]),
                               [0.5] * 4 + [1.5] * 4)
    np.testing.assert_allclose(grid.colors[:, 0], 1.0)  # red, normalized

    # two points in one voxel -> mean color
    pts2 = np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]], np.float32)
    cols2 = np.array([[1.0, 0, 0], [0, 0, 1.0]], np.float32)
    g2 = voxelize(pts2, cols2, voxel_size=1.0,
                  bb_min=[0, 0, 0], bb_max=[1, 1, 1])
    assert len(g2.centers) == 1 and g2.counts[0] == 2
    np.testing.assert_allclose(g2.colors[0], [0.5, 0, 0.5])


def test_voxel_mesh_and_writer(tmp_path):
    from icepy4d_tpu.post_processing import (voxel_mesh, voxelize,
                                             write_voxel_centers)

    pts = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]], np.float32)
    grid = voxelize(pts, None, 1.0, [0, 0, 0], [2, 1, 1])
    verts, faces, vcols = voxel_mesh(grid)
    assert verts.shape == (16, 3) and faces.shape == (24, 3)
    assert faces.max() == 15
    p = write_voxel_centers(grid, tmp_path / "vox.txt")
    assert len(p.read_text().splitlines()) == 2


def test_make_pairs_step():
    from icepy4d_tpu.post_processing import make_pairs

    names = [Path(f"sampled_2022_05_{d:02d}.ply")
             for d in (1, 6, 11, 16, 21)]
    # clouds are 5 days apart: step=5 pairs consecutive clouds
    pairs, dates = make_pairs(names, step=5)
    assert pairs[0] == (str(names[0]), str(names[1]))
    assert len(dates) == 5
    # step=1 with 5-day spacing: the closest date to +1 day is the
    # cloud itself (reference semantics, post_processing/utils.py:27-31)
    pairs1, _ = make_pairs(names, step=1)
    assert len(pairs1) == 4
    assert pairs1[0] == (str(names[0]), str(names[0]))


def test_dem_of_difference_direction_x():
    """DOD along x (the glacier-front direction the reference uses,
    volume_variations.py DOD_DIR='x'): a wall retreating by 2 m."""
    from icepy4d_tpu.post_processing import DemOfDifference

    rng = np.random.default_rng(0)
    n = 4000
    yz = rng.uniform([0, 60], [30, 100], (n, 2)).astype(np.float32)
    wall0 = np.column_stack([np.full(n, 50.0), yz[:, 0], yz[:, 1]])
    wall1 = np.column_stack([np.full(n, 48.0), yz[:, 0], yz[:, 1]])
    dod = DemOfDifference(wall0, wall1, dsm_step=1.0, direction="x")
    rep = dod.compute_volume()
    area = 30.0 * 40.0
    assert abs(rep.net - (-2.0 * area)) / area < 0.2
    assert rep.matching_percent > 95.0
    assert rep.avg_neighbors_per_cell > 1.0


def test_volume_variations_workflow(tmp_path):
    """Full pipeline: PLY season -> pairs -> DOD -> reference-schema
    CSV -> daily/cumulative series + plots."""
    from icepy4d_tpu.io.ply import write_ply
    from icepy4d_tpu.post_processing import volume_variations

    rng = np.random.default_rng(1)
    n = 3000
    yz = rng.uniform([0, 60], [30, 100], (n, 2)).astype(np.float32)
    paths = []
    for i, day in enumerate((1, 6, 11)):
        x = 50.0 - 1.0 * i  # front retreats 1 m per 5 days
        pts = np.column_stack([np.full(n, x, np.float32),
                               yz[:, 0], yz[:, 1]])
        p = tmp_path / f"sampled_2022_05_{day:02d}.ply"
        write_ply(p, pts)
        paths.append(p)

    df = volume_variations(paths, t_step=5, grid_step=1.0,
                           direction="x", out_dir=tmp_path / "out",
                           base_name="sampled")
    assert len(df) == 2
    assert (df["volume"] < 0).all()  # retreat = removed volume
    assert np.allclose(df["dt"], 5.0)
    np.testing.assert_allclose(df["volume_daily_cumul"].iloc[-1],
                               df["volume_daily"].sum(), rtol=1e-6)
    out = tmp_path / "out"
    assert (out / "sampled_dirX_tstep5_grid1.0.csv").exists()
    assert (out / "sampled_dirX_tstep5_grid1.0_proc.csv").exists()
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 2


def test_analysis_scripts_smoke(tmp_path):
    """CLI wrappers run end-to-end on tiny synthetic data."""
    from icepy4d_tpu.io.ply import write_ply

    pts = _front_scene(n=1500)
    for day in ("01", "06"):
        write_ply(tmp_path / f"dense_2022_05_{day}.ply", pts)

    env = {"PYTHONPATH": str(ROOT), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": str(tmp_path)}

    def run(*argv):
        r = subprocess.run([sys.executable, *argv], env=env,
                           capture_output=True, text=True, cwd=tmp_path)
        assert r.returncode == 0, r.stderr[-2000:]
        return r

    run(str(ROOT / "scripts/extract_section.py"),
        str(tmp_path / "dense_*.ply"), "--out", str(tmp_path / "border"),
        "--k", "16")
    assert (tmp_path / "border" / "top_border_coords.txt").exists()

    run(str(ROOT / "scripts/voxelization.py"),
        str(tmp_path / "dense_*.ply"), "--voxel-size", "5",
        "--out", str(tmp_path / "vox"), "--mesh")
    assert list((tmp_path / "vox").glob("*_voxel_5*.txt"))
    assert list((tmp_path / "vox").glob("*_vox_mesh.ply"))

    run(str(ROOT / "scripts/plot_sections.py"),
        str(tmp_path / "dense_2022_05_01.ply"), "--axis", "y",
        "--stations", "15", "--thickness", "4",
        "--out", str(tmp_path / "sec.png"))
    assert (tmp_path / "sec.png").exists()

    run(str(ROOT / "scripts/volume_variations.py"),
        str(tmp_path / "dense_*.ply"), "--tstep", "5",
        "--grid-step", "2", "--dir", "x", "--base-name", "dense",
        "--out", str(tmp_path / "vols"))
    assert list((tmp_path / "vols").glob("*_proc.csv"))

    run(str(ROOT / "scripts/pcd_rototranslation.py"),
        str(tmp_path / "dense_2022_05_01.ply"), "--mode", "loc2utm")
    assert (tmp_path / "dense_2022_05_01_utm.ply").exists()

    run(str(ROOT / "scripts/dynamic_visualization.py"),
        str(tmp_path / "dense_2022_05_0?.ply"),
        "--out", str(tmp_path / "anim"), "--max-points", "2000")
    assert len(list((tmp_path / "anim").glob("frame_*.png"))) == 2
