"""Native screened-Poisson reconstruction (post_processing/poisson.py).

The reference delegates to open3d's Poisson mesher
(ref post_processing/open3d_fun.py:200-341); this implementation is
self-contained, so the tests are geometric ground truth: metric
accuracy, watertightness (Euler characteristic + edge manifoldness),
outward orientation (signed volume), density pruning, and the glacier
use case (an open 2.5-D surface patch).
"""

import numpy as np
import pytest

from icepy4d_tpu.post_processing import (
    estimate_normals,
    marching_tetrahedra,
    meshing_poisson,
    poisson_reconstruct,
)


def _sphere(n=15000, r=5.0, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * r, v


def _mesh_stats(verts, faces):
    edges = np.sort(np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1)
    ek, cnt = np.unique(edges, axis=0, return_counts=True)
    euler = len(verts) - len(ek) + len(faces)
    p = verts[faces]
    vol = np.einsum("ij,ij->i", p[:, 0],
                    np.cross(p[:, 1], p[:, 2])).sum() / 6.0
    return euler, int((cnt != 2).sum()), vol


def test_sphere_metric_watertight_oriented():
    """Closed surface: exact radius, Euler characteristic 2, every edge
    shared by exactly 2 faces, positive signed volume (outward)."""
    pts, normals = _sphere()
    verts, faces, _ = poisson_reconstruct(
        pts, normals, depth=6, density_quantile=0.0)
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 5.0) < 0.05
    assert r.std() < 0.1
    euler, boundary, vol = _mesh_stats(verts, faces)
    assert euler == 2
    assert boundary == 0
    assert abs(vol - 4 / 3 * np.pi * 5.0**3) / (4 / 3 * np.pi * 125) < 0.02


def test_estimated_normals_match_analytic():
    pts, true_n = _sphere(n=8000, seed=1)
    n = estimate_normals(pts, k=16)  # auto-orient away from centroid
    agree = np.abs(np.sum(n * true_n, axis=1))
    assert agree.mean() > 0.98
    # outward (not inward): signed agreement, not just axis agreement
    assert np.sum(n * true_n, axis=1).mean() > 0.95


def test_viewpoint_orientation():
    pts, true_n = _sphere(n=4000, seed=2)
    vp = np.array([100.0, 0.0, 0.0])
    n = estimate_normals(pts, k=16, viewpoint=vp)
    # hemisphere facing the viewpoint must point toward it
    front = pts[:, 0] > 2.5
    assert (n[front] * (vp - pts[front])).sum(axis=1).min() > 0


def test_open_surface_patch():
    """The glacier case: a 2.5-D surface z = f(x, y) observed from
    above — reconstruction must track the height field."""
    rng = np.random.default_rng(3)
    xy = rng.uniform(-10, 10, (20000, 2))
    z = 2.0 * np.sin(xy[:, 0] * 0.4) + 1.5 * np.cos(xy[:, 1] * 0.3)
    pts = np.column_stack([xy, z])
    verts, faces, _ = poisson_reconstruct(
        pts, depth=6, viewpoint=np.array([0.0, 0.0, 100.0]),
        density_quantile=0.05)
    assert len(faces) > 1000
    # sample mesh vertices well inside the domain, compare to f
    inner = (np.abs(verts[:, 0]) < 8) & (np.abs(verts[:, 1]) < 8)
    v = verts[inner]
    zf = 2.0 * np.sin(v[:, 0] * 0.4) + 1.5 * np.cos(v[:, 1] * 0.3)
    err = np.abs(v[:, 2] - zf)
    assert np.median(err) < 0.35, np.median(err)


def test_density_pruning_removes_unsupported_faces():
    """A hemisphere cloud: pruning drops faces in the emptiest splat
    cells (the data-free closure rim) while keeping the well-supported
    cap — like the reference's density-quantile vertex removal
    (open3d_fun.py:262-276)."""
    pts, normals = _sphere(n=12000, seed=4)
    keep = pts[:, 2] > 0
    pts, normals = pts[keep], normals[keep]
    v_all, f_all, _ = poisson_reconstruct(
        pts, normals, depth=6, density_quantile=0.0)
    v_pr, f_pr, _ = poisson_reconstruct(
        pts, normals, depth=6, density_quantile=0.10)
    assert len(f_pr) < len(f_all)
    # the well-sampled top cap survives pruning
    cap_all = (v_all[f_all].mean(axis=1)[:, 2] > 3.0).sum()
    cap_pr = (v_pr[f_pr].mean(axis=1)[:, 2] > 3.0).sum()
    assert cap_pr > 0.8 * cap_all


def test_marching_tetrahedra_analytic_sphere():
    """Mesh a known implicit field directly (no Poisson): radius and
    topology must be exact."""
    D = 48
    g = np.arange(D) - (D - 1) / 2
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    field = 15.0 - np.sqrt(xx**2 + yy**2 + zz**2)  # >0 inside
    verts, faces = marching_tetrahedra(field, 0.0)
    r = np.linalg.norm(verts - (D - 1) / 2, axis=1)
    np.testing.assert_allclose(r.mean(), 15.0, atol=0.05)
    euler, boundary, _ = _mesh_stats(verts, faces)
    assert euler == 2
    assert boundary == 0


def test_meshing_poisson_native_default(tmp_path):
    """Public API (ref MeshingPoisson parity wrapper) writes a PLY."""
    pts, normals = _sphere(n=6000, seed=5)
    out = tmp_path / "mesh.ply"
    verts, faces = meshing_poisson(pts, depth=6, out_path=out)
    assert len(verts) > 100 and len(faces) > 100
    assert out.exists()
    head = out.read_text().splitlines()[:15]
    assert head[0] == "ply"
    assert any(f"element vertex {len(verts)}" in l for l in head)


def test_empty_field_no_crossing():
    field = np.ones((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_degenerate_cloud_raises():
    with pytest.raises(ValueError):
        poisson_reconstruct(np.zeros((10, 3)), np.ones((10, 3)))
