"""Fine-tuning LightGlue on pipeline-verified real correspondences
(training/lightglue_train.py: collect_epoch_pairs /
make_correspondence_dataset / explicit-GT supervision).

This is the MegaDepth-stage replacement of docs/tutorials/
self_training.md: a processed season's cross-camera track_ids ARE
verified wide-baseline correspondences; no reference counterpart (the
reference downloads fixed checkpoints and never trains).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icepy4d_tpu.models.lightglue import LightGlue
from icepy4d_tpu.models.superpoint import SuperPoint
from icepy4d_tpu.training.lightglue_train import (
    collect_epoch_pairs,
    evaluate_matching,
    make_correspondence_dataset,
    train_lightglue,
)


@pytest.fixture(scope="module")
def sp_and_params():
    sp = SuperPoint(max_keypoints=64, detection_threshold=0.0)
    return sp, sp.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def shifted_pair():
    """Textured frame + 8px-shifted copy with exact correspondences."""
    import cv2

    rng = np.random.default_rng(7)
    lo = rng.uniform(size=(30, 40)).astype(np.float32)
    base = cv2.resize(lo, (160, 120), interpolation=cv2.INTER_CUBIC)
    dx, dy = 8, 8
    img0 = base[: 120 - dy, : 160 - dx]
    img1 = base[dy:, dx:]
    gx, gy = np.meshgrid(np.arange(20, 140, 12), np.arange(20, 100, 12))
    corr0 = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    corr1 = corr0 - np.asarray([dx, dy], np.float32)
    keep = (corr1 > 4).all(1) & (corr1[:, 0] < 148) & (corr1[:, 1] < 108)
    return {"img0": img0, "img1": img1,
            "corr0": corr0[keep], "corr1": corr1[keep]}


def test_describe_at_matches_extract_sampling(sp_and_params,
                                              shifted_pair):
    """Descriptors at extract()'s own keypoints equal extract()'s
    descriptors — describe_at is the same dense map + sampler."""
    sp, params = sp_and_params
    img = jnp.asarray(shifted_pair["img0"][None])
    out = sp.extract(params, img)
    desc = sp.describe_at(params, img, out["keypoints"])
    m = np.asarray(out["mask"][0])
    np.testing.assert_allclose(np.asarray(desc[0])[m],
                               np.asarray(out["descriptors"][0])[m],
                               atol=1e-5)


def test_correspondence_dataset_builder(sp_and_params, shifted_pair):
    sp, params = sp_and_params
    rng = np.random.default_rng(0)
    n_kpts = 48
    ds = make_correspondence_dataset(
        rng,
        lambda imgs, kpts: sp.describe_at(params, imgs, kpts),
        lambda imgs: sp.extract(params, imgs),
        [shifted_pair], n_batches=2, batch=3, n_kpts=n_kpts)
    assert ds["kpts0"].shape == (2, 3, n_kpts, 2)
    assert ds["desc0"].shape == (2, 3, n_kpts, 256)
    assert ds["gt0"].shape == (2, 3, n_kpts)
    n_corr = len(shifted_pair["corr0"])
    n_pos = min(n_corr, n_kpts // 2)
    for b in range(2):
        for i in range(3):
            gt = ds["gt0"][b, i]
            assert (gt[:n_pos] == np.arange(n_pos)).all()
            assert (gt[n_pos:] == -1).all()
            # positive slots hold actual correspondence pixels
            k0 = ds["kpts0"][b, i, :n_pos]
            d = np.abs(k0[:, None, :]
                       - shifted_pair["corr0"][None]).sum(-1)
            assert (d.min(1) < 1e-4).all()
            # correspondence slots are never dustbin-supervised
            assert not ds["unm0"][b, i, :n_pos].any()
            # masked-off tail is not supervised either
            assert not ds["unm0"][b, i][~ds["mask0"][b, i]].any()
    # geometric consistency: positive pairs obey the known shift
    delta = ds["kpts0"][0, 0, :n_pos] - ds["kpts1"][0, 0, :n_pos]
    np.testing.assert_allclose(delta, np.asarray([[8.0, 8.0]]) *
                               np.ones((n_pos, 2)), atol=1e-4)


def test_collect_epoch_pairs(tmp_path, shifted_pair):
    """Season checkpoints -> correspondence pairs, matched by track_id,
    coordinates rescaled with the image."""
    import cv2

    from icepy4d_tpu.core.epoch import Epoch
    from icepy4d_tpu.core.features import Features
    from icepy4d_tpu.core.images import Image

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    paths = {}
    for cam, key in (("cam1", "img0"), ("cam2", "img1")):
        p = img_dir / f"{cam}.jpg"
        cv2.imwrite(str(p), (shifted_pair[key] * 255).astype(np.uint8))
        paths[cam] = p

    corr0, corr1 = shifted_pair["corr0"], shifted_pair["corr1"]
    n = len(corr0)
    ids = np.arange(100, 100 + n, dtype=np.int32)
    # cam2 stores tracks in a different order + one extra untracked
    perm = np.random.default_rng(1).permutation(n)
    f1 = Features.from_numpy(corr0, descr=np.zeros((n, 8), np.float32),
                             track_ids=ids)
    f2 = Features.from_numpy(
        np.concatenate([corr1[perm], [[5.0, 5.0]]]).astype(np.float32),
        descr=np.zeros((n + 1, 8), np.float32),
        track_ids=np.concatenate([ids[perm], [9999]]).astype(np.int32))
    ep = Epoch("2022-05-01 14:01:15",
               images={"cam1": Image(paths["cam1"]),
                       "cam2": Image(paths["cam2"])},
               features={"cam1": f1, "cam2": f2})
    ep_dir = tmp_path / "res" / "epochs" / ep.date_str
    ep_dir.mkdir(parents=True)
    ep.save_pickle(ep_dir / f"{ep.date_str}.pickle")

    pairs = collect_epoch_pairs(tmp_path / "res", min_corr=5,
                                image_scale=0.5)
    assert len(pairs) == 1
    pr = pairs[0]
    assert pr["img0"].shape == (56, 76)  # (120-8, 160-8) * 0.5
    assert len(pr["corr0"]) == n
    # track_id alignment: corr0[i] and corr1[i] are the same track,
    # whatever the storage order; rescaled with cv2's pixel-center
    # convention x -> (x + 0.5) * s - 0.5
    exp0 = (corr0 + 0.5) * 0.5 - 0.5
    exp1 = (corr1 + 0.5) * 0.5 - 0.5
    order = np.lexsort(pr["corr0"].T)
    ref_order = np.lexsort(exp0.T)
    np.testing.assert_allclose(pr["corr0"][order], exp0[ref_order],
                               atol=1e-4)
    np.testing.assert_allclose(pr["corr1"][order], exp1[ref_order],
                               atol=1e-4)


def test_collect_skips_failed_epochs(tmp_path, shifted_pair):
    import cv2

    from icepy4d_tpu.core.epoch import Epoch
    from icepy4d_tpu.core.features import Features
    from icepy4d_tpu.core.images import Image

    p = tmp_path / "cam.jpg"
    cv2.imwrite(str(p), (shifted_pair["img0"] * 255).astype(np.uint8))
    n = len(shifted_pair["corr0"])
    ids = np.arange(n, dtype=np.int32)
    feats = {
        "cam1": Features.from_numpy(shifted_pair["corr0"],
                                    track_ids=ids),
        "cam2": Features.from_numpy(shifted_pair["corr1"],
                                    track_ids=ids),
    }
    ep = Epoch("2022-05-01 14:01:15",
               images={"cam1": Image(p), "cam2": Image(p)},
               features=feats)
    ep.flag("few_matches", status="failed")
    ep_dir = tmp_path / "res" / "epochs" / ep.date_str
    ep_dir.mkdir(parents=True)
    ep.save_pickle(ep_dir / f"{ep.date_str}.pickle")
    assert collect_epoch_pairs(tmp_path / "res", min_corr=5) == []


def test_homography_to_explicit_matches_gt_assignment(sp_and_params):
    """Converted homography batches carry exactly the supervision the
    homography loss path would compute (enables mixed training)."""
    from icepy4d_tpu.training.lightglue_train import (
        gt_assignment, homography_to_explicit, make_lightglue_dataset)

    sp, params = sp_and_params
    rng = np.random.default_rng(2)
    ds = make_lightglue_dataset(
        rng, lambda imgs: sp.extract(params, imgs),
        n_batches=2, batch=2, h=120, w=160, extract_chunk=4)
    ex = homography_to_explicit(ds)
    assert "H" not in ex
    assert ex["gt0"].shape == (2, 2, ds["kpts0"].shape[2])
    g_ref, u0_ref, u1_ref = jax.tree.map(np.asarray, gt_assignment(
        jnp.asarray(ds["kpts0"][1]), jnp.asarray(ds["kpts1"][1]),
        jnp.asarray(ds["H"][1]), jnp.asarray(ds["mask0"][1]),
        jnp.asarray(ds["mask1"][1])))
    np.testing.assert_array_equal(ex["gt0"][1], g_ref)
    np.testing.assert_array_equal(ex["unm0"][1], u0_ref)
    np.testing.assert_array_equal(ex["unm1"][1], u1_ref)


FT_CKPT = (Path(__file__).resolve().parents[1] / "weights"
           / "lightglue_finetuned.npz")
BASE_CKPT = (Path(__file__).resolve().parents[1] / "weights"
             / "lightglue_synthetic.npz")
SP_CKPT = (Path(__file__).resolve().parents[1] / "weights"
           / "superpoint_synthetic.npz")


@pytest.mark.slow
@pytest.mark.skipif(not (FT_CKPT.exists() and BASE_CKPT.exists()
                         and SP_CKPT.exists()),
                    reason="fine-tuned checkpoint not present")
def test_finetuned_beats_base_on_real_wide_baseline(assets_dir):
    """The committed fine-tuned checkpoint must out-match the
    homography-pretrained one on REAL wide-baseline correspondences it
    never trained on (tests/data/real_corr_heldout.npz: the held-out
    epoch of the season fine-tune, SIFT+GCP-verified)."""
    import cv2

    from icepy4d_tpu.models.convert import load_params

    z = np.load(Path(__file__).parent / "data" / "real_corr_heldout.npz")
    imgs = {}
    for side, cam, name in (("img0", "cam0", "img0"),
                            ("img1", "cam1", "img1")):
        p = assets_dir / "img" / str(z[cam]) / str(z[name])
        g = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        assert g is not None, p
        imgs[side] = g.astype(np.float32) / 255.0
    pair = {"img0": imgs["img0"], "img1": imgs["img1"],
            "corr0": z["corr0"], "corr1": z["corr1"]}

    sp = SuperPoint(max_keypoints=512, detection_threshold=0.0005)
    sp_params = jax.tree.map(jnp.asarray, load_params(SP_CKPT))
    rng = np.random.default_rng(11)
    ds = make_correspondence_dataset(
        rng,
        lambda im, kp: sp.describe_at(sp_params, im, kp),
        lambda im: sp.extract(sp_params, im),
        [pair], n_batches=2, batch=2, n_kpts=512)

    # mutual-argmax quality (filter_threshold 0): the committed
    # artifact measured recall 0.033 / labeled precision 0.062 vs the
    # base's 0.003 / 0.004 — gates are set at comfortable floors so a
    # retrain with honest variance still passes, while a broken
    # artifact (or a regression to base-level transfer) fails.
    model = LightGlue(filter_threshold=0.0)
    base = evaluate_matching(
        model, jax.tree.map(jnp.asarray, load_params(BASE_CKPT)), ds)
    ft = evaluate_matching(
        model, jax.tree.map(jnp.asarray, load_params(FT_CKPT)), ds)
    assert ft["recall"] > 3.0 * max(base["recall"], 1e-4), (base, ft)
    assert ft["recall"] > 0.015, (base, ft)
    assert ft["precision_labeled"] > 4.0 * max(
        base["precision_labeled"], 1e-4), (base, ft)
    assert ft["precision_labeled"] > 0.03, (base, ft)


@pytest.mark.slow
def test_explicit_gt_training_learns():
    """A tiny LightGlue trained on explicit-GT correspondence batches
    (no homography anywhere) must learn to match them."""
    rng = np.random.default_rng(3)
    M, d = 48, 64
    n_clutter = 8

    def make(n_batches, batch):
        out = {k: [] for k in ("kpts0", "desc0", "kpts1", "desc1",
                               "gt0", "unm0", "unm1")}
        for _ in range(n_batches * batch):
            k0 = rng.uniform(10, 110, (M, 2)).astype(np.float32)
            d0 = rng.normal(size=(M, d)).astype(np.float32)
            d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
            k1 = k0 + rng.uniform(-8, 8, 2).astype(np.float32)
            d1 = d0 + 0.15 * rng.normal(size=(M, d)).astype(np.float32)
            d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
            gt0 = np.arange(M, dtype=np.int32)
            unm0 = np.zeros(M, bool)
            unm1 = np.zeros(M, bool)
            k1[-n_clutter:] = rng.uniform(10, 110, (n_clutter, 2))
            c = rng.normal(size=(n_clutter, d)).astype(np.float32)
            d1[-n_clutter:] = c / np.linalg.norm(c, 2, -1, keepdims=True)
            gt0[-n_clutter:] = -1
            unm0[-n_clutter:] = True
            unm1[-n_clutter:] = True
            perm = rng.permutation(M)
            inv = np.empty(M, np.int32)
            inv[perm] = np.arange(M)
            out["kpts0"].append(k0)
            out["desc0"].append(d0)
            out["kpts1"].append(k1[perm])
            out["desc1"].append(d1[perm])
            out["gt0"].append(np.where(gt0 >= 0, inv[gt0], -1))
            out["unm0"].append(unm0)
            out["unm1"].append(unm1[perm])
        ds = {k: np.stack(v).reshape(n_batches, batch, *v[0].shape)
              for k, v in out.items()}
        size = np.tile(np.asarray([160.0, 120.0], np.float32),
                       (n_batches, batch, 1))
        ds.update(mask0=np.ones((n_batches, batch, M), bool),
                  mask1=np.ones((n_batches, batch, M), bool),
                  size0=size, size1=size)
        return ds

    model = LightGlue(n_layers=3, num_heads=2, descriptor_dim=64,
                      input_dim=64, filter_threshold=0.1)
    train_ds = make(24, 8)
    test_ds = make(2, 8)
    before = evaluate_matching(model, model.init(0), test_ds)
    params, history = train_lightglue(
        model, train_ds, steps=1200, lr=1e-3, scan_chunk=400,
        log=lambda *a: None)
    after = evaluate_matching(model, params, test_ds)
    assert history[-1]["loss"] < history[0]["chunk_mean"]
    assert after["recall"] > 0.7, (before, after)
    assert after["precision"] > 0.7, (before, after)
    assert after["recall"] > before["recall"] + 0.3
