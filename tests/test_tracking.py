"""Temporal (4D) tracking tests: seeded matching on a known shift.

With identical texture shifted by a constant offset, even random-weight
descriptors match exactly (SuperPoint is deterministic), so tracked
positions must equal old positions + shift.
"""

import numpy as np
import pytest

from icepy4d_tpu.core.features import Features
from icepy4d_tpu.matching import (NearestNeighborMatcher, track_features,
                                  track_matches)

# multiple of SuperPoint's 8-px cell: with random (untrained) weights only
# grid-aligned shifts give identical descriptors; trained weights don't
# need this, but tests run without checkpoints
SHIFT = 8


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(42)
    base = (rng.uniform(size=(240, 320 + SHIFT)) * 255).astype(np.uint8)
    f0 = base[:, :320]
    f1 = base[:, SHIFT:320 + SHIFT]  # camera pans right by SHIFT px
    return f0, f1


@pytest.fixture(scope="module")
def matcher():
    # deterministic backend: learned matchers run with random weights in
    # CI (no checkpoints offline), which scrambles assignment scores
    return NearestNeighborMatcher({"max_keypoints": 512})


def _extract_host(matcher, img):
    import jax.numpy as jnp

    g = matcher._to_gray_device(img)
    feats = matcher._extract(jnp.asarray(g)[None], matcher._max_keypoints)
    m = np.asarray(feats["mask"][0])
    return (np.asarray(feats["keypoints"][0])[m],
            np.asarray(feats["descriptors"][0])[m],
            np.asarray(feats["scores"][0])[m])


def test_track_features_recovers_shift(matcher, frames):
    f0, f1 = frames
    kpts, descr, scores = _extract_host(matcher, f0)
    assert len(kpts) > 50
    new_kpts, found, new_descr, new_scores = track_features(
        matcher, kpts, descr, scores, f1, grid=(1, 1))
    assert found.mean() > 0.3
    dx = new_kpts[found][:, 0] - kpts[found][:, 0]
    dy = new_kpts[found][:, 1] - kpts[found][:, 1]
    assert abs(np.median(dx) + SHIFT) < 1.0  # content moves left
    assert abs(np.median(dy)) < 1.0


def test_track_features_tiled(matcher, frames):
    f0, f1 = frames
    kpts, descr, scores = _extract_host(matcher, f0)
    new_kpts, found, *_ = track_features(
        matcher, kpts, descr, scores, f1, grid=(2, 2))
    assert found.any()
    dx = new_kpts[found][:, 0] - kpts[found][:, 0]
    assert abs(np.median(dx) + SHIFT) < 1.0


def test_track_matches_intersects_cameras(matcher, frames):
    f0, f1 = frames
    kpts, descr, scores = _extract_host(matcher, f0)
    n = len(kpts)
    ids = np.arange(100, 100 + n, dtype=np.int32)
    feats = {
        "cam1": Features.from_numpy(kpts, descr=descr, scores=scores,
                                    track_ids=ids),
        "cam2": Features.from_numpy(kpts, descr=descr, scores=scores,
                                    track_ids=ids),
    }
    new = track_matches(matcher, feats,
                        {"cam1": f1, "cam2": f1}, grid=(1, 1))
    assert set(new) == {"cam1", "cam2"}
    n1 = len(new["cam1"])
    assert n1 == len(new["cam2"]) > 0
    # track ids survive and agree across cameras
    ids1 = set(new["cam1"].track_ids_to_numpy().tolist())
    ids2 = set(new["cam2"].track_ids_to_numpy().tolist())
    assert ids1 == ids2
    assert ids1.issubset(set(ids.tolist()))
