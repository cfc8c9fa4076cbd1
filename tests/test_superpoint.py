"""SuperPoint parity vs the reference's vendored torch model.

The reference torch model (read-only, used purely as a numerical oracle)
is instantiated with random weights (its checkpoint is unavailable
offline); we convert its state dict and require our JAX model to
reproduce its outputs.
"""

import sys
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icepy4d_tpu.models import convert
from icepy4d_tpu.models.superpoint import SuperPoint, simple_nms

torch = pytest.importorskip("torch")

SG_PATH = "/root/reference/src/icepy4d/thirdparty/SuperGlue"


@pytest.fixture(scope="module")
def torch_sp():
    sys.path.insert(0, SG_PATH)
    try:
        with mock.patch.object(torch.nn.Module, "load_state_dict",
                               lambda self, sd, **k: None), \
             mock.patch.object(torch, "load", lambda *a, **k: {}):
            from models.superpoint import SuperPoint as TorchSP

            torch.manual_seed(0)
            model = TorchSP({"nms_radius": 4, "keypoint_threshold": 0.005,
                             "max_keypoints": -1}).eval()
    finally:
        sys.path.remove(SG_PATH)
    return model


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 1, (64, 96)).astype(np.float32)


def test_dense_outputs_match(torch_sp, image):
    params = convert.superpoint_params_from_torch(torch_sp.state_dict())
    sp = SuperPoint(max_keypoints=512, precision="highest")

    heat, desc = sp.net.apply(params, jnp.asarray(image)[None, ..., None])

    # torch oracle: capture convPb logits + convDb descriptors via hooks
    captured = {}
    h1 = torch_sp.convPb.register_forward_hook(
        lambda m, i, o: captured.__setitem__("logits", o))
    h2 = torch_sp.convDb.register_forward_hook(
        lambda m, i, o: captured.__setitem__("desc", o))
    with torch.no_grad():
        torch_sp({"image": torch.from_numpy(image)[None, None]})
    h1.remove()
    h2.remove()

    logits = captured["logits"].numpy()[0]  # (65, Hc, Wc)
    e = np.exp(logits - logits.max(0, keepdims=True))
    probs = (e / e.sum(0, keepdims=True))[:64]
    hc, wc = probs.shape[1:]
    ref_heat = (probs.reshape(8, 8, hc, wc).transpose(2, 0, 3, 1)
                .reshape(hc * 8, wc * 8))
    np.testing.assert_allclose(np.asarray(heat[0]), ref_heat, atol=1e-5)

    d = captured["desc"].numpy()[0]  # (256, Hc, Wc)
    d = d / np.maximum(np.linalg.norm(d, axis=0, keepdims=True), 1e-12)
    np.testing.assert_allclose(
        np.asarray(desc[0]), d.transpose(1, 2, 0), atol=1e-5)


def test_keypoints_match_torch_pipeline(torch_sp, image):
    params = convert.superpoint_params_from_torch(torch_sp.state_dict())
    sp = SuperPoint(max_keypoints=2048, precision="highest")
    out = sp.extract(params, jnp.asarray(image)[None])

    with torch.no_grad():
        ref = torch_sp({"image": torch.from_numpy(image)[None, None]})
    ref_kpts = ref["keypoints"][0].numpy()
    ref_scores = ref["scores"][0].numpy()
    ref_desc = ref["descriptors"][0].numpy().T  # (N, 256)

    m = np.asarray(out["mask"][0])
    kpts = np.asarray(out["keypoints"][0])[m]
    scores = np.asarray(out["scores"][0])[m]
    desc = np.asarray(out["descriptors"][0])[m]

    assert kpts.shape[0] == ref_kpts.shape[0]
    # same keypoint set (order may differ) -> sort both by (y, x)
    oi = np.lexsort((kpts[:, 0], kpts[:, 1]))
    ri = np.lexsort((ref_kpts[:, 0], ref_kpts[:, 1]))
    np.testing.assert_array_equal(kpts[oi], ref_kpts[ri])
    np.testing.assert_allclose(scores[oi], ref_scores[ri], atol=1e-5)
    # descriptors: torch samples with grid_sample align_corners=True
    np.testing.assert_allclose(desc[oi], ref_desc[ri], atol=1e-4)


def test_simple_nms_isolates_maxima():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.uniform(0, 1, (1, 32, 32)).astype(np.float32))
    out = np.asarray(simple_nms(s, 4)[0])
    sn = np.asarray(s[0])
    ys, xs = np.nonzero(out)
    # surviving scores are unchanged; the global max always survives
    # (exact torch parity is covered by test_keypoints_match_torch_pipeline)
    assert all(out[y, x] == sn[y, x] for y, x in zip(ys, xs))
    gy, gx = np.unravel_index(sn.argmax(), sn.shape)
    assert out[gy, gx] == sn.max()
    assert len(ys) < sn.size / 8  # substantial suppression happened


def test_static_shapes_and_jit_cache():
    sp = SuperPoint(max_keypoints=128, precision="highest")
    params = sp.init(jax.random.PRNGKey(1), 64, 64)
    batch = jnp.zeros((3, 64, 64))
    out = sp.extract(params, batch)
    assert out["keypoints"].shape == (3, 128, 2)
    assert out["descriptors"].shape == (3, 128, 256)
    assert out["mask"].shape == (3, 128)


def test_topk_peaks_exact_vs_full_topk():
    """The NMS-cell top-k fast path returns exactly the full top_k
    result (values AND positions) on suppressed heatmaps, and
    preserves the output capacity on small images (fallback path)."""
    import jax.numpy as jnp

    from icepy4d_tpu.models.superpoint import _topk_peaks, simple_nms

    rng = np.random.default_rng(3)
    heat = jnp.asarray(rng.uniform(size=(2, 96, 128)), jnp.float32)
    heat = simple_nms(heat, 4)

    k = 200
    scores, kpts = _topk_peaks(heat, k, 4)
    flat = np.asarray(heat).reshape(2, -1)
    ref_scores = np.sort(flat, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.asarray(scores), ref_scores,
                               atol=0.0)
    # every returned position carries its claimed score
    kp = np.asarray(kpts).astype(int)
    for b in range(2):
        got = np.asarray(heat)[b, kp[b, :, 1], kp[b, :, 0]]
        np.testing.assert_allclose(got, np.asarray(scores)[b], atol=0.0)
    # positive positions are unique
    for b in range(2):
        pos = np.asarray(scores[b]) > 0
        ids = kp[b, pos, 1] * 128 + kp[b, pos, 0]
        assert len(np.unique(ids)) == pos.sum()

    # capacity preserved when the cell grid is smaller than K
    s2, k2 = _topk_peaks(heat, 4096, 4)
    assert s2.shape == (2, 4096) and k2.shape == (2, 4096, 2)
