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


def test_track_matches_three_cameras_differing_ids(matcher, frames):
    """n=3 generalization (ref track_matches.py is per-camera generic):
    cameras carry DIFFERENT id subsets (multicam epochs: slaves only
    hold the tracks they saw); tracking runs on the intersection and a
    track survives only if re-found in every camera."""
    f0, f1 = frames
    kpts, descr, scores = _extract_host(matcher, f0)
    n = len(kpts)
    assert n > 30
    ids = np.arange(500, 500 + n, dtype=np.int32)

    def feats(sl):
        return Features.from_numpy(kpts[sl], descr=descr[sl],
                                   scores=scores[sl], track_ids=ids[sl])

    # cam2 misses the first 5 tracks, cam3 the last 5
    prev = {
        "cam1": feats(slice(None)),
        "cam2": feats(slice(5, None)),
        "cam3": feats(slice(None, n - 5)),
    }
    new = track_matches(matcher, prev,
                        {"cam1": f1, "cam2": f1, "cam3": f1}, grid=(1, 1))
    assert set(new) == {"cam1", "cam2", "cam3"}
    sets = [set(new[c].track_ids_to_numpy().tolist()) for c in new]
    assert sets[0] == sets[1] == sets[2]
    common = set(ids[5:n - 5].tolist())
    assert sets[0] and sets[0].issubset(common)
    # tracked positions moved by the pan
    k_old = {i: k for i, k in zip(ids, kpts)}
    for c in new:
        k_new = new[c].kpts_to_numpy()
        i_new = new[c].track_ids_to_numpy()
        dx = np.asarray([k_new[j, 0] - k_old[i][0]
                         for j, i in enumerate(i_new)])
        assert abs(np.median(dx) + SHIFT) < 1.0


def test_track_matches_no_common_ids(matcher, frames):
    f0, f1 = frames
    kpts, descr, scores = _extract_host(matcher, f0)
    ids = np.arange(len(kpts), dtype=np.int32)
    prev = {
        "cam1": Features.from_numpy(kpts[:10], descr=descr[:10],
                                    scores=scores[:10],
                                    track_ids=ids[:10]),
        "cam2": Features.from_numpy(kpts[10:20], descr=descr[10:20],
                                    scores=scores[10:20],
                                    track_ids=ids[10:20]),
    }
    new = track_matches(matcher, prev, {"cam1": f1, "cam2": f1})
    assert all(len(v) == 0 for v in new.values())
