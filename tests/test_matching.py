"""Matching engine tests: tiler semantics, geometric verification,
and the full tiled matcher pipeline on synthetic + real images.

(The reference ships no matcher tests at all — tests/test_matching.py
there is fully commented out; this suite is our own.)
"""

import numpy as np
import pytest

from icepy4d_tpu.matching import (
    GeometricVerification,
    LightGlueMatcher,
    NearestNeighborMatcher,
    Quality,
    SuperGlueMatcher,
    TileSelection,
    Tiler,
    geometric_verification,
)


# ---------------------------------------------------------------------------
# Tiler
# ---------------------------------------------------------------------------

def test_tiler_grid_limits():
    img = np.zeros((400, 600), np.float32)
    t = Tiler(grid=[2, 3], overlap=20)
    limits, origin = t.compute_limits_by_grid(img)
    assert origin == [0, 0]
    assert len(limits) == 6
    th, tw = t.tile_size
    for (x0, y0, x1, y1) in limits.values():
        assert x1 - x0 == tw and y1 - y0 == th
        assert 0 <= x0 and x1 <= 600 and 0 <= y0 and y1 <= 400
    # tiles cover the full image extent
    assert min(l[0] for l in limits.values()) == 0
    assert max(l[2] for l in limits.values()) == 600


def test_tiler_extract_all_matches_host_crops():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(200, 300)).astype(np.float32)
    t = Tiler(grid=[2, 2], overlap=10)
    limits, _ = t.compute_limits_by_grid(img)
    tiles = np.asarray(t.extract_all(img))
    for i, lim in limits.items():
        np.testing.assert_allclose(tiles[i], t.extract_patch(img, lim))


# ---------------------------------------------------------------------------
# geometric verification
# ---------------------------------------------------------------------------

def _synthetic_epipolar_pair(n=200, n_out=40, seed=3):
    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    R = np.eye(3)
    t = np.array([1.0, 0.0, 0.0])
    x0 = (K @ pts.T).T
    x0 = x0[:, :2] / x0[:, 2:]
    p1 = (R @ pts.T).T + t
    x1 = (K @ p1.T).T
    x1 = x1[:, :2] / x1[:, 2:]
    x1[:n_out] += rng.uniform(20, 80, (n_out, 2))  # gross outliers
    return x0.astype(np.float32), x1.astype(np.float32), n_out


def test_geometric_verification_rejects_outliers():
    x0, x1, n_out = _synthetic_epipolar_pair()
    F, inl = geometric_verification(x0, x1, threshold=1.0)
    assert F is not None and F.shape == (3, 3)
    # all outliers rejected, most inliers kept
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].mean() > 0.9


def test_geometric_verification_few_matches_passthrough():
    x0 = np.zeros((5, 2), np.float32)
    x1 = np.zeros((5, 2), np.float32)
    F, inl = geometric_verification(x0, x1)
    assert F is None and inl.all() and inl.shape == (5,)


def test_geometric_verification_none_method():
    x0, x1, _ = _synthetic_epipolar_pair(50, 0)
    F, inl = geometric_verification(
        x0, x1, method=GeometricVerification.NONE)
    assert F is None and inl.all()


# ---------------------------------------------------------------------------
# matchers (random weights — we check plumbing/shapes/invariance, not
# match quality, which the model parity tests already cover)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def checker_pair():
    """A translated textured pair: identical content shifted 8 px.

    Band-limited texture (upsampled low-res noise) so the correspondence
    survives pyramid downsampling, unlike white noise.
    """
    import cv2

    rng = np.random.default_rng(7)
    lo = rng.uniform(size=(30, 41)).astype(np.float32)
    base = cv2.resize(lo, (328, 240), interpolation=cv2.INTER_CUBIC)
    base = np.clip(base * 255, 0, 255).astype(np.uint8)
    img0 = base[:, :320]
    img1 = base[:, 8:]
    return img0, img1


@pytest.fixture(scope="module")
def lg():
    # deterministic NN backend: behavioral asserts (shift recovery) need
    # meaningful matches, which random-weight learned matchers can't give
    return NearestNeighborMatcher({"max_keypoints": 512})


def test_lightglue_full_frame(lg, checker_pair):
    img0, img1 = checker_pair
    ok = lg.match(img0, img1, quality=Quality.HIGH,
                  tile_selection=TileSelection.NONE,
                  geometric_verification=GeometricVerification.NONE)
    assert ok
    assert lg.mkpts0.shape == lg.mkpts1.shape
    assert lg.mkpts0.shape[1] == 2
    assert lg.descriptors0.shape[0] == 256
    assert lg.descriptors0.shape[1] == len(lg.mkpts0)
    assert len(lg.mconf) == len(lg.mkpts0)
    # identical texture shifted by 8 px: matched x-coords must differ by ~8
    assert len(lg.mkpts0) > 50
    dx = np.median(lg.mkpts0[:, 0] - lg.mkpts1[:, 0])
    assert abs(dx - 8.0) < 1.0


def test_lightglue_grid_tiling(lg, checker_pair):
    img0, img1 = checker_pair
    ok = lg.match(img0, img1, quality=Quality.HIGH,
                  tile_selection=TileSelection.GRID,
                  grid=[2, 2], overlap=16,
                  geometric_verification=GeometricVerification.NONE)
    assert ok
    # keypoints must be in full-image coordinates
    if len(lg.mkpts0):
        assert lg.mkpts0[:, 0].max() <= img0.shape[1]
        assert lg.mkpts0[:, 1].max() <= img0.shape[0]
        # dedup on kpts0: all rows unique
        assert len(np.unique(lg.mkpts0, axis=0)) == len(lg.mkpts0)


def test_lightglue_exhaustive_tiling_and_gv(lg, checker_pair):
    img0, img1 = checker_pair
    ok = lg.match(img0, img1, quality=Quality.HIGH,
                  tile_selection=TileSelection.EXHAUSTIVE,
                  grid=[1, 2], overlap=16, threshold=2.0)
    assert ok
    assert lg.mkpts0.shape == lg.mkpts1.shape


def test_quality_rescaling_returns_original_coords(lg):
    # 16 px shift: still cell-aligned after MEDIUM's half-res downsample
    # (random-weight descriptors only match exactly on aligned shifts)
    import cv2

    rng = np.random.default_rng(9)
    lo = rng.uniform(size=(30, 42)).astype(np.float32)
    base = np.clip(cv2.resize(lo, (336, 240),
                              interpolation=cv2.INTER_CUBIC) * 255,
                   0, 255).astype(np.uint8)
    img0, img1 = base[:, :320], base[:, 16:]
    lg.match(img0, img1, quality=Quality.MEDIUM,
             tile_selection=TileSelection.NONE,
             geometric_verification=GeometricVerification.NONE)
    assert len(lg.mkpts0) > 20
    # medium = half-res matching, but outputs must be full-res pixels
    assert lg.mkpts0[:, 0].max() > img0.shape[1] / 4
    dx = np.median(lg.mkpts0[:, 0] - lg.mkpts1[:, 0])
    assert abs(dx - 16.0) < 2.5


def test_lightglue_matcher_plumbing(checker_pair):
    img0, img1 = checker_pair
    m = LightGlueMatcher({"max_keypoints": 256, "n_layers": 2})
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.NONE,
                 geometric_verification=GeometricVerification.NONE)
    assert ok
    assert m.mkpts0.shape == m.mkpts1.shape
    assert m.descriptors0.shape[0] == 256
    assert len(m.mconf) == len(m.mkpts0)


def test_superglue_matcher_full(checker_pair):
    img0, img1 = checker_pair
    sg = SuperGlueMatcher({"max_keypoints": 256, "sinkhorn_iterations": 5})
    ok = sg.match(img0, img1, quality=Quality.HIGH,
                  tile_selection=TileSelection.NONE,
                  geometric_verification=GeometricVerification.NONE)
    assert ok
    assert sg.mkpts0.shape == sg.mkpts1.shape
    assert sg.descriptors0.shape[0] == 256


def test_preselection_on_real_images(assets_dir):
    import cv2

    cam1 = sorted((assets_dir / "img" / "cam1").glob("*"))
    cam2 = sorted((assets_dir / "img" / "cam2").glob("*"))
    if not cam1 or not cam2:
        pytest.skip("no sample images")
    img0 = cv2.imread(str(cam1[0]), cv2.IMREAD_GRAYSCALE)
    img1 = cv2.imread(str(cam2[0]), cv2.IMREAD_GRAYSCALE)
    lgm = NearestNeighborMatcher({"max_keypoints": 512})
    ok = lgm.match(img0, img1, quality=Quality.LOW,
                   tile_selection=TileSelection.PRESELECTION,
                   grid=[2, 2], overlap=20,
                   geometric_verification=GeometricVerification.NONE)
    assert ok  # random weights: just exercise the full preselection path


def test_semidense_matcher_recovers_shift(checker_pair):
    from icepy4d_tpu.matching import SemiDenseMatcher

    img0, img1 = checker_pair
    m = SemiDenseMatcher({"grid_pool": 1, "distance_threshold": 0.5})
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.NONE,
                 geometric_verification=GeometricVerification.NONE)
    assert ok
    # detector-free: dense coverage, far more matches than max_keypoints
    assert len(m.mkpts0) > 300
    dx = np.median(m.mkpts0[:, 0] - m.mkpts1[:, 0])
    assert abs(dx - 8.0) < 1.0  # 8 px = one grid cell at pool=1


def test_semidense_refinement_improves_subpixel(checker_pair):
    """OC refinement recovers a non-grid-aligned shift the coarse grid
    cannot represent (coarse cells are 8/16 px)."""
    import cv2

    from icepy4d_tpu.matching import SemiDenseMatcher

    rng = np.random.default_rng(3)
    lo = rng.uniform(size=(30, 41)).astype(np.float32)
    base = np.clip(cv2.resize(lo, (328, 240),
                              interpolation=cv2.INTER_CUBIC) * 255,
                   0, 255).astype(np.uint8)
    M = np.float32([[1, 0, -5.4], [0, 1, 2.3]])
    img0 = base[:, :320]
    img1 = cv2.warpAffine(img0, M, (320, 240))

    kwargs = dict(quality=Quality.HIGH, tile_selection=TileSelection.NONE,
                  geometric_verification=GeometricVerification.NONE)
    coarse = SemiDenseMatcher({"grid_pool": 1, "distance_threshold": 0.3,
                               "refine": False})
    coarse.match(img0, img1, **kwargs)
    fine = SemiDenseMatcher({"grid_pool": 1, "distance_threshold": 0.3,
                             "refine": True})
    fine.match(img0, img1, **kwargs)
    assert len(fine.mkpts0) > 100

    def err(m):
        # warpAffine (forward M): content at x0 lands at x0 + (-5.4, 2.3)
        d = m.mkpts1 - m.mkpts0
        return np.abs(np.median(d[:, 0]) + 5.4) + \
            np.abs(np.median(d[:, 1]) - 2.3)

    # grid-quantized coarse matches can't express the fractional shift
    assert err(fine) < 0.3
    assert err(fine) < err(coarse)


# ---------------------------------------------------------------------------
# exact-architecture LoFTR matcher (detector-free, models/loftr.py)
# ---------------------------------------------------------------------------

def test_loftr_matcher_full_frame_recovers_shift(checker_pair):
    from icepy4d_tpu.matching import LoFTRMatcher

    img0, img1 = checker_pair
    m = LoFTRMatcher({"confidence_threshold": 1e-4, "max_matches": 512})
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.NONE,
                 geometric_verification=GeometricVerification.NONE)
    assert ok
    # identical content shifted 8 px = exactly one coarse cell: even
    # random-weight features match (cells carry identical activations)
    assert len(m.mkpts0) > 25
    assert m.descriptors0.shape[0] == 128
    dx = np.median(m.mkpts0[:, 0] - m.mkpts1[:, 0])
    dy = np.median(m.mkpts0[:, 1] - m.mkpts1[:, 1])
    assert abs(dx - 8.0) < 2.0 and abs(dy) < 2.0


def test_loftr_matcher_tiled(checker_pair):
    from icepy4d_tpu.matching import LoFTRMatcher

    img0, img1 = checker_pair
    m = LoFTRMatcher({"confidence_threshold": 1e-4, "max_matches": 256})
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.GRID,
                 grid=[2, 1], overlap=32,
                 geometric_verification=GeometricVerification.NONE)
    assert ok
    assert len(m.mkpts0) > 30
    dx = np.median(m.mkpts0[:, 0] - m.mkpts1[:, 0])
    assert abs(dx - 8.0) < 2.0
    # tiled coordinates are full-image coordinates
    assert m.mkpts0[:, 0].max() > 160


def test_loftr_matcher_alias_is_exact_arch():
    from icepy4d_tpu.matching import LOFTRMatcher, LoFTRMatcher

    assert LOFTRMatcher is LoFTRMatcher
