"""Exact-architecture LoFTR: parity vs a torch oracle with kornia's
module layout (shared random weights), plus matcher-surface tests.

The reference runs kornia's pretrained LoFTR
(ref src/icepy4d/matching/matchers.py:1005-1199); kornia is unavailable
offline, so tests/oracle_loftr.py re-implements the published
architecture in torch with kornia's exact state-dict names — the
converter (models.convert.loftr_params_from_torch) is exercised on the
real checkpoint key layout.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from icepy4d_tpu.models import convert
from icepy4d_tpu.models.loftr import LoFTR, sine_pos_encoding

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
from oracle_loftr import LoFTR as TorchLoFTR  # noqa: E402

THR = 1e-8  # random weights: dual-softmax confidences are tiny


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchLoFTR(temp_bug_fix=False, thr=THR).eval()
    # randomize BN running stats so their conversion is actually tested
    gen = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=gen) * 0.1
            m.running_var = (
                torch.rand(m.num_features, generator=gen) * 0.5 + 0.75)
    return model


@pytest.fixture(scope="module")
def jax_model():
    return LoFTR(thr=THR, temp_bug_fix=False, max_matches=128,
                 precision="highest")


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(3)
    img0 = rng.uniform(0, 1, (64, 96)).astype(np.float32)
    # image1: shifted copy + noise so some structure is shared
    img1 = np.roll(img0, (8, 16), axis=(0, 1))
    img1 = np.clip(
        img1 + rng.normal(0, 0.05, img1.shape), 0, 1).astype(np.float32)
    return img0, img1


def test_pos_encoding_matches_torch(torch_model):
    pe_t = torch_model.pos_encoding.pe[0].numpy()  # (C, H, W)
    pe_j = sine_pos_encoding(256, 32, 48, temp_bug_fix=False)
    np.testing.assert_allclose(
        pe_j, pe_t[:, :32, :48].transpose(1, 2, 0), atol=1e-6)
    pe_fix = sine_pos_encoding(256, 8, 8, temp_bug_fix=True)
    assert not np.allclose(pe_fix, pe_j[:8, :8])


def test_backbone_parity(torch_model, jax_model, pair):
    from icepy4d_tpu.models.loftr import backbone_apply

    params = convert.loftr_params_from_torch(torch_model.state_dict())
    img = pair[0]
    with torch.no_grad():
        fc_t, ff_t = torch_model.backbone(
            torch.from_numpy(img)[None, None])
    import jax

    with jax.default_matmul_precision("highest"):
        fc_j, ff_j = backbone_apply(
            jax.tree.map(jnp.asarray, params["backbone"]),
            jnp.asarray(img)[None, ..., None])
    np.testing.assert_allclose(
        np.asarray(fc_j[0]), fc_t[0].numpy().transpose(1, 2, 0),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ff_j[0]), ff_t[0].numpy().transpose(1, 2, 0),
        atol=2e-4)


def test_full_forward_parity(torch_model, jax_model, pair):
    params = convert.loftr_params_from_torch(torch_model.state_dict())
    img0, img1 = pair

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(img0)[None, None],
                          torch.from_numpy(img1)[None, None])
    out = jax_model.match_pair(params, img0, img1)

    valid = np.asarray(out["valid"])
    n_jax = int(valid.sum())
    n_ref = int(ref["confidence"].shape[0])
    assert n_ref > 5, "oracle produced too few matches to be a real test"
    assert n_jax == n_ref

    def table(k0, k1, conf):
        return {tuple(np.round(np.asarray(a), 3)): (tuple(np.asarray(b)), c)
                for a, b, c in zip(k0, k1, conf)}

    t_ref = table(ref["keypoints0"].numpy(), ref["keypoints1"].numpy(),
                  ref["confidence"].numpy())
    k0 = np.asarray(out["keypoints0"])[valid]
    k1 = np.asarray(out["keypoints1"])[valid]
    cf = np.asarray(out["confidence"])[valid]
    assert len(t_ref) == n_ref
    for a, b, c in zip(k0, k1, cf):
        key = tuple(np.round(a, 3))
        assert key in t_ref, f"jax match {key} missing from oracle"
        b_ref, c_ref = t_ref[key]
        np.testing.assert_allclose(b, b_ref, atol=5e-3)
        np.testing.assert_allclose(c, c_ref, atol=1e-5)


def test_converter_roundtrip_shapes(torch_model, jax_model):
    params = convert.loftr_params_from_torch(torch_model.state_dict())
    init = jax_model.init(0)

    import jax

    ref_shapes = jax.tree.map(lambda a: jnp.asarray(a).shape, params)
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    assert ref_shapes == init_shapes


def test_matcher_prefix_stripped(torch_model):
    sd = {f"matcher.{k}": v for k, v in torch_model.state_dict().items()}
    params = convert.loftr_params_from_torch(sd)
    assert "backbone" in params and "coarse" in params


def test_odd_size_padding(jax_model):
    """Non-/8 sizes pad internally; pad cells never match."""
    params = jax_model.init(0)
    rng = np.random.default_rng(5)
    img0 = rng.uniform(0, 1, (61, 85)).astype(np.float32)
    img1 = rng.uniform(0, 1, (61, 85)).astype(np.float32)
    out = jax_model.match_pair(params, img0, img1)
    valid = np.asarray(out["valid"])
    k0 = np.asarray(out["keypoints0"])[valid]
    k1 = np.asarray(out["keypoints1"])[valid]
    if len(k0):
        assert k0.max(initial=0) < 85 and k1.max(initial=0) < 85


def test_match_batch_consistent(jax_model):
    """Batch forward == per-pair forward; padded pairs masked out."""
    params = jax_model.init(0)
    rng = np.random.default_rng(11)
    imgs0 = rng.uniform(0, 1, (2, 64, 64)).astype(np.float32)
    imgs1 = rng.uniform(0, 1, (2, 64, 64)).astype(np.float32)
    out_b = jax_model.match_batch(
        params, jnp.asarray(imgs0), jnp.asarray(imgs1),
        jnp.asarray([True, False]))
    assert not bool(np.asarray(out_b["valid"])[1].any())
    out_s = jax_model.match_pair(params, imgs0[0], imgs1[0])
    np.testing.assert_allclose(
        np.asarray(out_b["keypoints1"])[0][np.asarray(out_b["valid"])[0]],
        np.asarray(out_s["keypoints1"])[np.asarray(out_s["valid"])],
        atol=1e-4)


def test_oversized_frame_raises_actionable_error(jax_model):
    params = jax_model.init(0)
    big = np.zeros((4096, 6144), np.float32)
    with pytest.raises(ValueError, match="lower Quality or tile"):
        jax_model.match_pair(params, big, big)
