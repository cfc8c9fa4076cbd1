"""Adaptive depth/width LightGlue (VERDICT round-1 item 5).

Reference behavior: thirdparty/LightGlue/lightglue/lightglue.py:491-510
(token-confidence early exit) and :563-579 (point pruning). Our
TPU-native realization is a host-driven loop over jit-compiled segments
with pow2-bucket prune-by-gather (models/lightglue.py::match_adaptive).
"""

import jax
import numpy as np
import pytest

from icepy4d_tpu.models.lightglue import LightGlue


def _make_data(rng, b=2, m=96, n=96, d=256):
    data = {
        "kpts0": rng.uniform(0, 400, (b, m, 2)).astype(np.float32),
        "desc0": rng.normal(size=(b, m, d)).astype(np.float32),
        "mask0": np.ones((b, m), bool),
        "size0": np.broadcast_to(np.asarray([400.0, 400.0], np.float32),
                                 (b, 2)),
        "kpts1": rng.uniform(0, 400, (b, n, 2)).astype(np.float32),
        "desc1": rng.normal(size=(b, n, d)).astype(np.float32),
        "mask1": np.ones((b, n), bool),
        "size1": np.broadcast_to(np.asarray([400.0, 400.0], np.float32),
                                 (b, 2)),
    }
    # make side-1 a permuted copy of side-0 so real matches exist
    perm = rng.permutation(m)
    data["desc1"] = data["desc0"][:, perm]
    data["kpts1"] = data["kpts0"][:, perm]
    return data, perm


@pytest.fixture(scope="module")
def model():
    lg = LightGlue(n_layers=6, filter_threshold=0.0)
    return lg, lg.init(jax.random.PRNGKey(0))


def test_adaptive_matches_static_when_no_trigger(model):
    """Random-weight confidences sit near 0.5 < 0.8 threshold: neither
    early exit nor pruning fires, so the adaptive path must reproduce
    the static forward exactly."""
    lg, params = model
    data, _ = _make_data(np.random.default_rng(0))
    ref = jax.tree.map(np.asarray, lg.match(params, data))
    out = lg.match_adaptive(params, data, check_every=2)
    assert out["layers_run"] == lg.n_layers
    assert out["capacity"] == data["mask0"].shape[1]
    np.testing.assert_array_equal(out["matches0"], ref["matches0"])
    np.testing.assert_array_equal(out["matches1"], ref["matches1"])
    np.testing.assert_allclose(out["mscores0"], ref["mscores0"], atol=1e-5)


def _force_confidence(params, bias):
    """Pin every token-confidence head to sigmoid(bias)."""
    out = jax.tree.map(lambda a: a, params)  # shallow copy
    out["confidence"] = [
        {"token": {"kernel": np.zeros_like(np.asarray(c["token"]["kernel"])),
                   "bias": np.full_like(
                       np.asarray(c["token"]["bias"]), bias)}}
        for c in params["confidence"]
    ]
    return out


def test_adaptive_depth_early_exit(model):
    """All tokens confident -> exit at the first checkpoint, matches
    equal a static forward truncated at that layer."""
    lg, params = model
    params_c = _force_confidence(params, +10.0)  # confidence ~ 1.0
    data, _ = _make_data(np.random.default_rng(1))
    out = lg.match_adaptive(params_c, data, check_every=2)
    assert out["layers_run"] == 2

    # truncated static reference: 2 layers + that layer's assign head
    lg2 = LightGlue(n_layers=2, filter_threshold=0.0)
    params2 = {
        "input_proj": params["input_proj"],
        "posenc": params["posenc"],
        "layers": params["layers"][:2],
        "assign": [params["assign"][0], params["assign"][1]],
        "confidence": [params["confidence"][0]],
    }
    ref = jax.tree.map(np.asarray, lg2.match(params2, data))
    np.testing.assert_array_equal(out["matches0"], ref["matches0"])


def test_adaptive_width_prunes_and_keeps_quality(model):
    """High confidence + sub-threshold matchability prunes tokens into a
    smaller pow2 bucket; surviving geometry must still be matched and
    mapped back to original slots."""
    lg, params = model
    params_c = _force_confidence(params, +10.0)
    data, perm = _make_data(np.random.default_rng(2), m=128, n=128)
    # width_confidence such that ~half the tokens fall under the
    # matchability keep-threshold (random-weight matchability ~ U-shaped
    # around 0.5) -> capacity halves; depth_confidence=0 disables exit
    out = lg.match_adaptive(
        params_c, data, depth_confidence=0.0,
        width_confidence=1.0 - 0.5, check_every=2, min_capacity=16)
    assert out["capacity"] <= 64
    m0 = out["matches0"]
    valid = m0 > -1
    assert valid.sum() > 0
    # every surviving match must agree with the known permutation:
    # desc1[:, j] = desc0[:, perm[j]]  =>  slot i matches argsort(perm)[i]
    b_idx, s_idx = np.nonzero(valid)
    inv = np.argsort(perm)
    gt = inv[s_idx]
    agree = (m0[b_idx, s_idx] == gt).mean()
    assert agree > 0.9, f"only {agree:.2f} of surviving matches correct"


def test_adaptive_via_matcher_surface():
    """LightGlueMatcher(adaptive=True) runs end-to-end on an image pair
    and recovers the known shift."""
    import cv2

    from icepy4d_tpu.matching import (
        GeometricVerification, LightGlueMatcher, Quality, TileSelection)

    rng = np.random.default_rng(5)
    lo = rng.uniform(size=(30, 41)).astype(np.float32)
    base = cv2.resize(lo, (328, 240), interpolation=cv2.INTER_CUBIC)
    base = np.clip(base * 255, 0, 255).astype(np.uint8)
    img0, img1 = base[:, :320], base[:, 8:]
    m = LightGlueMatcher({"max_keypoints": 256, "filter_threshold": 0.0,
                          "n_layers": 4, "adaptive": True})
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.NONE,
                 geometric_verification=GeometricVerification.NONE)
    assert ok and len(m.mkpts0) > 20
    dx = np.median(m.mkpts0[:, 0] - m.mkpts1[:, 0])
    assert abs(dx - 8.0) < 1.0
