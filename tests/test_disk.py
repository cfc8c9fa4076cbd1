"""DISK extractor: shapes, masking, matcher integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icepy4d_tpu.models.disk import DISK, disk_init


def test_disk_extract_shapes():
    model, params = disk_init(max_keypoints=256)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(2, 96, 128)), jnp.float32)
    out = model.extract(params, imgs)
    assert out["keypoints"].shape == (2, 256, 2)
    assert out["descriptors"].shape == (2, 256, 128)
    assert out["scores"].shape == (2, 256)
    # descriptors L2-normalized where valid
    m = np.asarray(out["mask"])
    d = np.asarray(out["descriptors"])
    norms = np.linalg.norm(d[m], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # keypoints inside the image
    k = np.asarray(out["keypoints"])[m]
    assert k[:, 0].max() < 128 and k[:, 1].max() < 96


def test_disk_arbitrary_size_padding():
    model, params = disk_init(max_keypoints=64)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(size=(1, 70, 93)), jnp.float32)
    out = model.extract(params, imgs)
    m = np.asarray(out["mask"][0])
    k = np.asarray(out["keypoints"][0])[m]
    # no detections in the padded band
    assert k[:, 0].max() < 93 and k[:, 1].max() < 70


def test_disk_backed_nn_matcher_recovers_shift():
    import cv2

    from icepy4d_tpu.matching import (GeometricVerification,
                                      NearestNeighborMatcher, Quality,
                                      TileSelection)

    rng = np.random.default_rng(7)
    lo = rng.uniform(size=(30, 41)).astype(np.float32)
    base = np.clip(cv2.resize(lo, (328, 240),
                              interpolation=cv2.INTER_CUBIC) * 255,
                   0, 255).astype(np.uint8)
    img0, img1 = base[:, :320], base[:, 8:]
    m = NearestNeighborMatcher({"extractor": "disk", "max_keypoints": 512,
                                "distance_threshold": 0.5})
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.NONE,
                 geometric_verification=GeometricVerification.NONE)
    assert ok
    assert m.descriptors0.shape[0] == 128
    assert len(m.mkpts0) > 30
    dx = np.median(m.mkpts0[:, 0] - m.mkpts1[:, 0])
    assert abs(dx - 8.0) < 1.5


def test_matching_io_roundtrip(tmp_path):
    from icepy4d_tpu.matching.utils import (load_matches_from_disk,
                                            retrieve_matches_from_npz,
                                            save_matches_as_npz)

    rng = np.random.default_rng(2)
    mk0 = rng.uniform(0, 100, (40, 2)).astype(np.float32)
    mk1 = rng.uniform(0, 100, (40, 2)).astype(np.float32)
    np.savetxt(tmp_path / "keypoints_0.txt", mk0, fmt="%.2f",
               delimiter=",", header="x,y")
    np.savetxt(tmp_path / "keypoints_1.txt", mk1, fmt="%.2f",
               delimiter=",", header="x,y")
    a, b = load_matches_from_disk(tmp_path)
    np.testing.assert_allclose(a, mk0, atol=0.01)

    save_matches_as_npz(tmp_path / "m.npz", mk0, mk1)
    r0, r1, conf = retrieve_matches_from_npz(tmp_path / "m.npz")
    np.testing.assert_allclose(r1, mk1)
    assert conf.shape == (40,)


# ---------------------------------------------------------------------------
# torch-oracle parity (original DISK thin U-Net; tests/oracle_disk.py)
# ---------------------------------------------------------------------------

def _torch_oracle():
    import sys
    from pathlib import Path

    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(Path(__file__).parent))
    from oracle_disk import DISK as TorchDISK

    torch.manual_seed(0)
    model = TorchDISK().eval()
    return torch, model


def test_disk_dense_parity_vs_torch():
    """Converted torch weights reproduce heatmap + dense descriptors."""
    import jax

    from icepy4d_tpu.models import convert
    from icepy4d_tpu.models.disk import unet_apply

    torch, oracle = _torch_oracle()
    params = convert.disk_params_from_torch(oracle.state_dict())

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    heat_t, desc_t = oracle.heatmap_and_dense_descriptors(
        torch.from_numpy(img))

    with jax.default_matmul_precision("highest"):
        out = unet_apply(jax.tree.map(jnp.asarray, params),
                         jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out[0, ..., 128]), heat_t[0, 0].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out[0, ..., :128]),
        desc_t[0].numpy().transpose(1, 2, 0), atol=2e-4)


def test_disk_keypoint_parity_vs_torch():
    """Full extract(): same keypoints/scores/descriptors as the oracle's
    NMS + threshold + top-n path."""
    import jax

    from icepy4d_tpu.models import convert

    torch, oracle = _torch_oracle()
    params = convert.disk_params_from_torch(oracle.state_dict())

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    (k_t, s_t, d_t), = oracle.detect(torch.from_numpy(img), n=128)

    model = DISK(max_keypoints=128, nms_window_size=5,
                 detection_threshold=0.0)
    with jax.default_matmul_precision("highest"):
        out = model.extract(jax.tree.map(jnp.asarray, params),
                            jnp.asarray(img.transpose(0, 2, 3, 1)))
    m = np.asarray(out["mask"][0])
    k_j = np.asarray(out["keypoints"][0])[m]
    s_j = np.asarray(out["scores"][0])[m]
    d_j = np.asarray(out["descriptors"][0])[m]

    assert len(k_t) > 10, "oracle found too few keypoints to test"
    assert len(k_j) == len(k_t)
    t = {tuple(map(int, k)): (float(s), d.numpy())
         for k, s, d in zip(k_t, s_t, d_t)}
    for k, s, d in zip(k_j, s_j, d_j):
        key = tuple(map(int, k))
        assert key in t, f"jax keypoint {key} not in oracle set"
        s_ref, d_ref = t[key]
        np.testing.assert_allclose(s, s_ref, atol=1e-4)
        np.testing.assert_allclose(d, d_ref, atol=1e-3)


def test_disk_converter_shapes_roundtrip():
    from icepy4d_tpu.models import convert

    _, oracle = _torch_oracle()
    params = convert.disk_params_from_torch(oracle.state_dict())
    model = DISK()
    init = model.init()
    import jax

    assert jax.tree.map(lambda a: np.asarray(a).shape, params) == \
        jax.tree.map(lambda a: np.asarray(a).shape, init)


def test_disk_backed_lightglue_matcher_runs():
    """DISK (128-d) + LightGlue with an input projection — the
    reference's disk+lightglue pairing (lightglue.py features='disk')."""
    import cv2

    from icepy4d_tpu.matching import (GeometricVerification,
                                      LightGlueMatcher, Quality,
                                      TileSelection)

    rng = np.random.default_rng(3)
    lo = rng.uniform(size=(30, 41)).astype(np.float32)
    base = np.clip(cv2.resize(lo, (328, 240),
                              interpolation=cv2.INTER_CUBIC) * 255,
                   0, 255).astype(np.uint8)
    img0, img1 = base[:, :320], base[:, 8:]
    m = LightGlueMatcher({"extractor": "disk", "max_keypoints": 256,
                          "n_layers": 2, "filter_threshold": 0.0})
    assert m.descriptor_dim == 128
    ok = m.match(img0, img1, quality=Quality.HIGH,
                 tile_selection=TileSelection.NONE,
                 geometric_verification=GeometricVerification.NONE)
    assert ok
    # 128-d descriptors flow through the 128->256 input projection
    assert m.descriptors0.shape[0] == 128
    assert len(m.mkpts0) == len(m.mconf)
