"""ALIKED-style extractor (models/aliked.py): static shapes,
8-aligned-shift equivariance of detection and description, trainability,
and matcher-registry wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icepy4d_tpu.models.aliked import ALIKED, aliked_init


@pytest.fixture(scope="module")
def model_params():
    return aliked_init(0, max_keypoints=512)


def _image(seed=0, h=160, w=192):
    rng = np.random.default_rng(seed)
    # smooth blobs + noise: enough structure for score peaks
    img = rng.uniform(0, 1, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    img += 0.1 * rng.standard_normal((h, w)).astype(np.float32)
    return np.clip(img, 0, 1)


def test_extract_static_shapes(model_params):
    m, params = model_params
    img = jnp.asarray(np.stack([_image(0), _image(1)]))
    out = m.extract(params, img)
    assert out["keypoints"].shape == (2, 512, 2)
    assert out["descriptors"].shape == (2, 512, 128)
    assert out["scores"].shape == (2, 512)
    assert out["mask"].dtype == bool
    v = np.asarray(out["mask"])
    assert v.sum() > 0
    d = np.asarray(out["descriptors"])[v]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0,
                               atol=1e-4)
    k = np.asarray(out["keypoints"])[v]
    assert (k[:, 0] >= 0).all() and (k[:, 0] < 192).all()
    assert (k[:, 1] >= 0).all() and (k[:, 1] < 160).all()


def test_shift_equivariance(model_params):
    """8-aligned roll: detections and descriptors must follow (conv
    backbone + aligned pooling are shift-equivariant away from edges)."""
    m, params = model_params
    img = _image(2)
    dy, dx = 16, 24
    img2 = np.roll(img, (dy, dx), (0, 1))
    o1 = m.extract(params, jnp.asarray(img[None]))
    o2 = m.extract(params, jnp.asarray(img2[None]))
    v1 = np.asarray(o1["mask"][0])
    v2 = np.asarray(o2["mask"][0])
    k1 = np.asarray(o1["keypoints"][0])[v1]
    k2 = np.asarray(o2["keypoints"][0])[v2]
    d1 = np.asarray(o1["descriptors"][0])[v1]
    d2 = np.asarray(o2["descriptors"][0])[v2]
    h, w = img.shape
    # interior keypoints whose shifted position stays interior
    margin = 20
    sel = ((k1[:, 0] > margin) & (k1[:, 0] < w - dx - margin)
           & (k1[:, 1] > margin) & (k1[:, 1] < h - dy - margin))
    assert sel.sum() >= 5
    shifted = k1[sel] + np.array([dx, dy])
    dist = np.linalg.norm(shifted[:, None] - k2[None], axis=-1)
    nn = dist.argmin(1)
    hit = dist[np.arange(len(nn)), nn] < 1.0
    assert hit.mean() > 0.5, f"only {hit.mean():.0%} keypoints follow"
    cos = (d1[sel][hit] * d2[nn[hit]]).sum(-1)
    assert np.median(cos) > 0.9


def test_training_reduces_loss():
    from icepy4d_tpu.training.aliked_train import train_aliked

    m, params = aliked_init(0, max_keypoints=128)
    losses = []
    p = train_aliked(m, params, steps=20, batch=4, h=96, w=128,
                     n_batches=4, scan_chunk=10, lr=1e-3,
                     log=lambda s: losses.append(
                         float(s.split("loss ")[1])))
    assert losses[-1] < losses[0]
    # params actually moved
    d0 = jax.tree.leaves(params)[0]
    d1 = jax.tree.leaves(p)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_matcher_registry_aliked():
    """extractor='aliked' wires through NearestNeighborMatcher and
    yields shift-consistent matches on an 8-aligned rolled pair."""
    from icepy4d_tpu.matching import NearestNeighborMatcher

    img = (_image(3, 256, 320) * 255).astype(np.uint8)
    img2 = np.roll(img, (24, 40), (0, 1))
    matcher = NearestNeighborMatcher(
        {"extractor": "aliked", "max_keypoints": 512, "ratio": 0.95})
    matcher.match(img, img2, geometric_verification=None)
    mk0, mk1 = matcher.mkpts0, matcher.mkpts1
    assert len(mk0) >= 10
    d = mk1 - mk0
    good = (np.abs(d - np.array([40, 24])) < 1.5).all(1)
    assert good.mean() > 0.3, f"only {good.mean():.0%} shift-consistent"
