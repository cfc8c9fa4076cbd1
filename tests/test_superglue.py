"""SuperGlue parity vs the reference's vendored torch model (random weights)."""

import sys
from unittest import mock

import numpy as np
import pytest

import jax.numpy as jnp

from icepy4d_tpu.models import convert
from icepy4d_tpu.models.superglue import SuperGlue, log_optimal_transport

torch = pytest.importorskip("torch")

SG_PATH = "/root/reference/src/icepy4d/thirdparty/SuperGlue"


@pytest.fixture(scope="module")
def torch_sg():
    sys.path.insert(0, SG_PATH)
    try:
        with mock.patch.object(torch.nn.Module, "load_state_dict",
                               lambda self, sd, **k: None), \
             mock.patch.object(torch, "load", lambda *a, **k: {}):
            from models.superglue import SuperGlue as TorchSG

            torch.manual_seed(0)
            model = TorchSG({"sinkhorn_iterations": 20,
                             "match_threshold": 0.2}).eval()
    finally:
        sys.path.remove(SG_PATH)
    return model


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(21)
    m, n = 50, 70
    kpts0 = rng.uniform(0, [640, 480], (m, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, [640, 480], (n, 2)).astype(np.float32)
    d0 = rng.normal(size=(m, 256)).astype(np.float32)
    d1 = rng.normal(size=(n, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    s0 = rng.uniform(0.1, 1, m).astype(np.float32)
    s1 = rng.uniform(0.1, 1, n).astype(np.float32)
    return kpts0, d0, s0, kpts1, d1, s1


def _jax_match(torch_sg, pair, pad=0):
    params = convert.superglue_params_from_torch(torch_sg.state_dict())
    kpts0, d0, s0, kpts1, d1, s1 = pair
    m, n = len(kpts0), len(kpts1)
    sg = SuperGlue(sinkhorn_iterations=20, precision="highest")

    def padr(x, rows):
        pad_shape = (rows,) + x.shape[1:]
        return np.concatenate([x, np.zeros(pad_shape, x.dtype)])

    data = {
        "kpts0": jnp.asarray(padr(kpts0, pad))[None],
        "desc0": jnp.asarray(padr(d0, pad))[None],
        "scores0": jnp.asarray(padr(s0, pad))[None],
        "mask0": jnp.asarray(np.arange(m + pad) < m)[None],
        "size0": jnp.asarray([[640.0, 480.0]]),
        "kpts1": jnp.asarray(padr(kpts1, pad))[None],
        "desc1": jnp.asarray(padr(d1, pad))[None],
        "scores1": jnp.asarray(padr(s1, pad))[None],
        "mask1": jnp.asarray(np.arange(n + pad) < n)[None],
        "size1": jnp.asarray([[640.0, 480.0]]),
    }
    return sg.match(params, data), m, n


def _torch_match(torch_sg, pair):
    kpts0, d0, s0, kpts1, d1, s1 = pair
    with torch.no_grad():
        return torch_sg({
            "descriptors0": torch.from_numpy(d0.T)[None],
            "descriptors1": torch.from_numpy(d1.T)[None],
            "keypoints0": torch.from_numpy(kpts0)[None],
            "keypoints1": torch.from_numpy(kpts1)[None],
            "scores0": torch.from_numpy(s0)[None],
            "scores1": torch.from_numpy(s1)[None],
            "image0": torch.zeros(1, 1, 480, 640),
            "image1": torch.zeros(1, 1, 480, 640),
        })


def test_matches_match_torch(torch_sg, pair):
    out, m, n = _jax_match(torch_sg, pair)
    ref = _torch_match(torch_sg, pair)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"][0]), ref["matches0"][0].numpy())
    np.testing.assert_array_equal(
        np.asarray(out["matches1"][0]), ref["matches1"][0].numpy())
    np.testing.assert_allclose(
        np.asarray(out["mscores0"][0]), ref["matching_scores0"][0].numpy(),
        atol=1e-4)


def test_padding_invariance(torch_sg, pair):
    out0, m, n = _jax_match(torch_sg, pair, pad=0)
    out1, _, _ = _jax_match(torch_sg, pair, pad=23)
    np.testing.assert_array_equal(
        np.asarray(out0["matches0"][0]), np.asarray(out1["matches0"][0, :m]))
    np.testing.assert_allclose(
        np.asarray(out0["mscores0"][0]), np.asarray(out1["mscores0"][0, :m]),
        atol=1e-4)
    assert (np.asarray(out1["matches0"][0, m:]) == -1).all()


def test_sinkhorn_doubly_stochastic():
    """OT output must satisfy the prescribed marginals (valid block)."""
    rng = np.random.default_rng(2)
    m, n = 12, 9
    sim = jnp.asarray(rng.normal(size=(1, m, n)).astype(np.float32))
    mask0 = jnp.ones((1, m), bool)
    mask1 = jnp.ones((1, n), bool)
    Z = log_optimal_transport(sim, jnp.asarray(0.5), 200, mask0, mask1)
    P = np.exp(np.asarray(Z[0]))
    # each keypoint row sums to 1 (match prob + dustbin), after un-norm by m+n
    np.testing.assert_allclose(P[:m].sum(1), 1.0, atol=1e-4)
    np.testing.assert_allclose(P[:, :n].sum(0), 1.0, atol=1e-4)
    np.testing.assert_allclose(P.sum(), m + n, rtol=1e-4)
