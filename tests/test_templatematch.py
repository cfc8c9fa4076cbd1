"""Orientation-correlation template matching tests (vs known shifts).

The reference has no tests for its pyimgraft OC port; we validate ours
against synthetic ground-truth displacements, including subpixel ones.
"""

import numpy as np
import pytest

from icepy4d_tpu.matching.templatematch import (MatchResult, TemplateMatch,
                                                forient, oc_track)


@pytest.fixture(scope="module")
def terrain():
    """Smooth random terrain with structure at several scales."""
    import cv2

    rng = np.random.default_rng(3)
    img = np.zeros((400, 500), np.float32)
    for cell in (8, 16, 32, 64):
        lo = rng.uniform(size=(400 // cell + 1, 500 // cell + 1))
        img += cv2.resize(lo.astype(np.float32), (500, 400),
                          interpolation=cv2.INTER_CUBIC)
    img -= img.min()
    img /= img.max()
    return (img * 255).astype(np.float32)


def _shift(img, dx, dy):
    import cv2

    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_CUBIC)


def test_forient_unit_magnitude(terrain):
    f = np.asarray(forient(terrain))
    assert f.dtype == np.complex64
    m = np.abs(f)[5:-5, 5:-5]
    np.testing.assert_allclose(m, 1.0, atol=1e-5)


def test_oc_integer_shift(terrain):
    B = _shift(terrain, 7, -3)
    xy = np.array([[150, 150], [250, 200], [350, 120], [200, 300]],
                  np.float64)
    tm = TemplateMatch(terrain, B, xy, template_width=64, search_width=96)
    res = tm.match()
    assert isinstance(res, MatchResult)
    assert np.isfinite(res.du).all()
    np.testing.assert_allclose(res.du, 7.0, atol=0.3)
    np.testing.assert_allclose(res.dv, -3.0, atol=0.3)
    assert (res.snr > 5).all()


def test_oc_subpixel_shift(terrain):
    B = _shift(terrain, 2.3, 1.6)
    xy = np.array([[150, 150], [250, 200], [300, 250]], np.float64)
    res = TemplateMatch(terrain, B, xy, template_width=64,
                        search_width=96).match()
    np.testing.assert_allclose(res.du, 2.3, atol=0.35)
    np.testing.assert_allclose(res.dv, 1.6, atol=0.35)


def test_oc_initial_guess_extends_range(terrain):
    B = _shift(terrain, 40, 0)  # beyond the (96-64)/2 = 16 px range
    xy = np.array([[150, 150], [250, 200]], np.float64)
    res0 = TemplateMatch(terrain, B, xy, template_width=64,
                         search_width=96).match()
    # without the guess the true peak is outside the search region
    assert not np.allclose(res0.du, 40.0, atol=1.0)
    res = TemplateMatch(terrain, B, xy, template_width=64, search_width=96,
                        initialdu=38.0).match()
    np.testing.assert_allclose(res.du, 40.0, atol=0.5)


def test_oc_out_of_bounds_points_are_nan(terrain):
    B = _shift(terrain, 1, 1)
    xy = np.array([[10, 10], [150, 150], [495, 395], [np.nan, 100]],
                  np.float64)
    res = TemplateMatch(terrain, B, xy, template_width=64,
                        search_width=96).match()
    assert np.isnan(res.du[0]) and np.isnan(res.du[2]) and np.isnan(res.du[3])
    assert np.isfinite(res.du[1])


def test_oc_track_batches_on_precomputed_orientation(terrain):
    B = _shift(terrain, -5, 4)
    A_or = forient(terrain)
    B_or = forient(B)
    xy = np.array([[150, 150], [250, 200]], np.float64)
    res = oc_track(A_or, B_or, xy, template_width=64, search_width=96)
    np.testing.assert_allclose(res.du, -5.0, atol=0.3)
    np.testing.assert_allclose(res.dv, 4.0, atol=0.3)


def test_track_targets_driver(terrain, tmp_path):
    from icepy4d_tpu.utils.track_targets import TrackTargets
    import cv2

    slaves = []
    shifts = [(3, 1), (-4, 2)]
    for i, (dx, dy) in enumerate(shifts):
        p = tmp_path / f"slave_{i}.png"
        cv2.imwrite(str(p), _shift(terrain, dx, dy).astype(np.uint8))
        slaves.append(p)
    master = tmp_path / "master.png"
    cv2.imwrite(str(master), terrain.astype(np.uint8))

    xy = np.array([[150, 150], [250, 200], [350, 250]], np.float64)
    tt = TrackTargets(master, slaves, xy, out_dir=str(tmp_path / "res"),
                      target_names=["F1", "F2", "F3"],
                      template_width=64, search_width=96,
                      snr_threshold=3.0)
    results = tt.track()
    assert set(results) == {"slave_0", "slave_1"}
    for (dx, dy), stem in zip(shifts, ["slave_0", "slave_1"]):
        out = results[stem]
        assert out["ok"].all()
        np.testing.assert_allclose(out["xy"][:, 0] - xy[:, 0], dx, atol=0.5)
        np.testing.assert_allclose(out["xy"][:, 1] - xy[:, 1], dy, atol=0.5)
        # CSVs readable by core.Targets
        from icepy4d_tpu.core import Targets

        t = Targets(im_file_path=[tmp_path / "res" / f"{stem}.csv"])
        coords, found = t.get_image_coor_by_label(["F1", "F2", "F3"], 0)
        assert len(found) == 3


def test_track_targets_matches_human_annotations(assets_dir, tmp_path):
    """REAL-DATA validation: track the surveyed glacier targets across
    the sample season and compare to the human per-image annotations
    (sub-pixel agreement expected on stable targets)."""
    import cv2
    import pandas as pd

    from icepy4d_tpu.utils.track_targets import TrackTargets

    imgs = sorted((assets_dir / "img" / "cam1").glob("*.jpg"))
    if len(imgs) < 2:
        pytest.skip("no sample season")
    s = 1200 / 6012.0  # sample images are downscaled from full res

    def annotations(stem, labels):
        df = pd.read_csv(assets_dir / "targets" / f"{stem}.csv")
        return {l: np.array([df[df.label == l].iloc[0].x,
                             df[df.label == l].iloc[0].y]) * s
                for l in labels if (df.label == l).any()}

    labels = ["F2", "F11"]
    master = annotations(imgs[0].stem, labels)
    assert set(master) == set(labels)
    xy = np.stack([master[l] for l in labels])

    tt = TrackTargets(imgs[0], imgs[1:], xy, target_names=labels,
                      out_dir=str(tmp_path), template_width=24,
                      search_width=64, snr_threshold=2.0)
    results = tt.track()

    n_checked = 0
    for p in imgs[1:]:
        out = results[p.stem]
        assert out["ok"].all(), f"targets lost in {p.stem}"
        ann = annotations(p.stem, labels)
        for i, l in enumerate(labels):
            if l in ann:
                err = np.linalg.norm(out["xy"][i] - ann[l])
                assert err < 1.5, f"{p.stem}/{l}: {err:.2f} px"
                n_checked += 1
    assert n_checked >= 3  # several human-annotated checks ran
