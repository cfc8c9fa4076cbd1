"""LightGlue parity vs the reference's vendored torch model (random weights,
adaptive depth/width disabled so both sides run the full static forward)."""

import sys
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icepy4d_tpu.models import convert
from icepy4d_tpu.models.lightglue import LightGlue, filter_matches

torch = pytest.importorskip("torch")

LG_PATH = "/root/reference/src/icepy4d/thirdparty/LightGlue"


@pytest.fixture(scope="module")
def torch_lg():
    sys.path.insert(0, LG_PATH)
    # the lightglue package __init__ pulls kornia (absent here) via its
    # DISK wrapper; stub it out — we only need the matcher module
    sys.modules.setdefault("kornia", mock.MagicMock())
    try:
        from lightglue.lightglue import LightGlue as TorchLG

        torch.manual_seed(0)
        model = TorchLG(features=None, depth_confidence=-1,
                        width_confidence=-1, flash=False).eval()
    finally:
        sys.path.remove(LG_PATH)
    return model


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(11)
    m, n = 60, 80
    kpts0 = rng.uniform(0, [640, 480], (m, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, [640, 480], (n, 2)).astype(np.float32)
    d0 = rng.normal(size=(m, 256)).astype(np.float32)
    d1 = rng.normal(size=(n, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    return kpts0, d0, kpts1, d1


def _jax_match(torch_lg, pair, pad=0):
    params = convert.lightglue_params_from_torch(torch_lg.state_dict())
    kpts0, d0, kpts1, d1 = pair
    m, n = len(kpts0), len(kpts1)
    lg = LightGlue(precision="highest")

    def padded(x, rows):
        return np.concatenate([x, np.ones((rows, x.shape[1]), x.dtype)])

    data = {
        "kpts0": jnp.asarray(padded(kpts0, pad))[None],
        "desc0": jnp.asarray(padded(d0, pad))[None],
        "mask0": jnp.asarray(np.arange(m + pad) < m)[None],
        "size0": jnp.asarray([[640.0, 480.0]]),
        "kpts1": jnp.asarray(padded(kpts1, pad))[None],
        "desc1": jnp.asarray(padded(d1, pad))[None],
        "mask1": jnp.asarray(np.arange(n + pad) < n)[None],
        "size1": jnp.asarray([[640.0, 480.0]]),
    }
    return lg.match(params, data), m, n


def _torch_match(torch_lg, pair):
    kpts0, d0, kpts1, d1 = pair
    with torch.no_grad():
        return torch_lg({
            "image0": {"keypoints": torch.from_numpy(kpts0)[None],
                       "descriptors": torch.from_numpy(d0)[None],
                       "image_size": torch.tensor([[640.0, 480.0]])},
            "image1": {"keypoints": torch.from_numpy(kpts1)[None],
                       "descriptors": torch.from_numpy(d1)[None],
                       "image_size": torch.tensor([[640.0, 480.0]])},
        })


def test_matches_match_torch(torch_lg, pair):
    out, m, n = _jax_match(torch_lg, pair)
    ref = _torch_match(torch_lg, pair)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"][0]), ref["matches0"][0].numpy())
    np.testing.assert_array_equal(
        np.asarray(out["matches1"][0]), ref["matches1"][0].numpy())
    np.testing.assert_allclose(
        np.asarray(out["mscores0"][0]), ref["matching_scores0"][0].numpy(),
        atol=1e-4)


def test_padding_invariance(torch_lg, pair):
    """Padding rows must not change valid matches (mask correctness)."""
    out0, m, n = _jax_match(torch_lg, pair, pad=0)
    out1, _, _ = _jax_match(torch_lg, pair, pad=37)
    np.testing.assert_array_equal(
        np.asarray(out0["matches0"][0]), np.asarray(out1["matches0"][0, :m]))
    np.testing.assert_allclose(
        np.asarray(out0["mscores0"][0]), np.asarray(out1["mscores0"][0, :m]),
        atol=1e-4)
    # padded rows are never matched
    assert (np.asarray(out1["matches0"][0, m:]) == -1).all()


def test_filter_matches_mutual_and_threshold():
    # hand-built log assignment: 0<->1 strong mutual, 1->0 one-sided
    block = np.full((1, 3, 4), -10.0, np.float32)
    block[0, 0, 1] = -0.01   # strong mutual pair
    block[0, 1, 0] = -0.2
    block[0, 2, 0] = -0.1    # 2 also prefers 0 -> 0 prefers... col0 max is row2
    scores = np.full((1, 4, 5), -10.0, np.float32)
    scores[:, :3, :4] = block
    m0, m1, s0, s1 = filter_matches(jnp.asarray(scores), th=0.1)
    m0 = np.asarray(m0)[0]
    assert m0[0] == 1          # mutual, exp(-0.01) > 0.1
    assert m0[1] == -1         # loses col 0 to row 2
    assert m0[2] == 0 and np.asarray(s0)[0, 2] == pytest.approx(
        np.exp(-0.1), abs=1e-5)


def test_attention_pallas_interpret_matches_xla():
    from icepy4d_tpu.ops.attention import _xla_attention, flash_attention

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 4, 128, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 256, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 256, 64)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(2, 256)) > 0.3)
    ours = flash_attention(q, k, v, mask, interpret=True)
    ref = _xla_attention(q, k, v, mask)
    # the kernel takes bf16 operands (f32 accumulation): tolerance is
    # bf16's ~3 decimal digits on O(1) normal inputs
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_bfloat16_trunk_matches_f32():
    """The bf16 activation trunk must agree with the f32 forward on
    nearly every match decision (assignment head stays f32)."""
    from icepy4d_tpu.models.lightglue import LightGlue

    rng = np.random.default_rng(7)
    B, N, D = 2, 256, 256
    m32 = LightGlue(filter_threshold=0.0)
    m16 = LightGlue(filter_threshold=0.0, activation_dtype="bfloat16")
    p = m32.init(0)
    k0 = rng.uniform(0, 1000, (B, N, 2)).astype(np.float32)
    data = {
        "kpts0": jnp.asarray(k0),
        "kpts1": jnp.asarray(k0 + 8.0),
        "desc0": jnp.asarray(rng.normal(size=(B, N, D)) / 16, jnp.float32),
        "desc1": jnp.asarray(rng.normal(size=(B, N, D)) / 16, jnp.float32),
        "mask0": jnp.ones((B, N), bool),
        "mask1": jnp.ones((B, N), bool),
        "size0": jnp.full((B, 2), 1000.0),
        "size1": jnp.full((B, 2), 1000.0),
    }
    a32 = np.asarray(m32.match(p, data)["matches0"])
    a16 = np.asarray(m16.match(p, data)["matches0"])
    assert (a32 == a16).mean() > 0.95
