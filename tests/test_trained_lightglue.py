"""Guard the committed self-trained LightGlue checkpoint.

weights/lightglue_synthetic.npz is a build artifact
(scripts/train_lightglue.py); these tests pin its BEHAVIOR so a broken
retrain or a corrupted file cannot silently ship: on a fresh
homography-supervised dataset (self-trained SuperPoint features) it
must match far better than chance and than the raw-descriptor
mutual-NN baseline that its inputs allow.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WEIGHTS = Path(__file__).resolve().parents[1] / "weights"
LG_CKPT = WEIGHTS / "lightglue_synthetic.npz"
SP_CKPT = WEIGHTS / "superpoint_synthetic.npz"

pytestmark = pytest.mark.skipif(
    not (LG_CKPT.exists() and SP_CKPT.exists()),
    reason="self-trained checkpoints not present")


@pytest.fixture(scope="module")
def eval_data():
    from icepy4d_tpu.models.convert import load_params
    from icepy4d_tpu.models.superpoint import SuperPoint
    from icepy4d_tpu.training.lightglue_train import make_lightglue_dataset

    rng = np.random.default_rng(20260817)
    sp = SuperPoint(max_keypoints=512, detection_threshold=0.0005)
    sp_params = jax.tree.map(jnp.asarray, load_params(SP_CKPT))
    ds = make_lightglue_dataset(
        rng, lambda imgs: sp.extract(sp_params, imgs),
        n_batches=2, batch=8, h=240, w=320,
        real_pool=None, extract_chunk=16)
    return ds


@pytest.mark.slow
def test_checkpoint_beats_nn_baseline(eval_data):
    from icepy4d_tpu.models.convert import load_params
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.training.lightglue_train import (evaluate_matching,
                                                      gt_assignment)

    model = LightGlue(filter_threshold=0.1)
    params = jax.tree.map(jnp.asarray, load_params(LG_CKPT))
    rep = evaluate_matching(model, params, eval_data)

    # raw-descriptor mutual-NN on the SAME data = what the inputs alone
    # support (the matcher must add contextual value on top)
    tp = fp = n_gt = 0
    ds = eval_data
    for b in range(ds["H"].shape[0]):
        gt0 = np.asarray(gt_assignment(
            jnp.asarray(ds["kpts0"][b]), jnp.asarray(ds["kpts1"][b]),
            jnp.asarray(ds["H"][b]), jnp.asarray(ds["mask0"][b]),
            jnp.asarray(ds["mask1"][b]))[0])
        for i in range(ds["desc0"].shape[1]):
            sim = ds["desc0"][b, i] @ ds["desc1"][b, i].T
            sim[~ds["mask0"][b, i]] = -2
            sim[:, ~ds["mask1"][b, i]] = -2
            nn0 = sim.argmax(1)
            nn1 = sim.argmax(0)
            mutual = nn1[nn0] == np.arange(len(nn0))
            pred = mutual & ds["mask0"][b, i] & (sim.max(1) > 0.7)
            m = np.where(pred, nn0, -1)
            tp += int(((m == gt0[i]) & (gt0[i] >= 0) & pred).sum())
            fp += int((pred & (m != gt0[i])).sum())
            n_gt += int((gt0[i] >= 0).sum())
    nn_precision = tp / max(tp + fp, 1)
    nn_recall = tp / max(n_gt, 1)

    assert rep["n_gt"] > 100
    # absolute quality floor for the committed artifact, plus a margin
    # over what the raw descriptors alone support (the 16k-step
    # checkpoint reaches ~0.94 recall / ~0.90 precision here vs the NN
    # baseline's ~0.64 / ~0.73)
    assert rep["recall"] > 0.5, (rep, nn_precision, nn_recall)
    assert rep["precision"] > 0.5, (rep, nn_precision, nn_recall)
    assert rep["recall"] > nn_recall + 0.05, (
        rep, nn_precision, nn_recall)
    assert rep["precision"] > nn_precision + 0.05, (
        rep, nn_precision, nn_recall)


def test_checkpoint_loads_into_matcher():
    from icepy4d_tpu.matching import LightGlueMatcher

    m = LightGlueMatcher({
        "max_keypoints": 256,
        "superpoint_weights": str(SP_CKPT),
        "lightglue_weights": str(LG_CKPT),
    })
    assert len(m._matcher_params["layers"]) == 9
    assert m._matcher_params["layers"][0]["self_attn"]["Wqkv"][
        "kernel"].shape == (256, 768)


def test_bundled_checkpoints_are_default(monkeypatch):
    """Weight-less matchers load the committed checkpoints by default
    (the tests' ICEPY4D_RANDOM_WEIGHTS=1 override monkeypatched off)."""
    from icepy4d_tpu.matching import LightGlueMatcher
    from icepy4d_tpu.models.convert import load_params

    monkeypatch.setenv("ICEPY4D_RANDOM_WEIGHTS", "0")
    m = LightGlueMatcher({"max_keypoints": 128})
    lg_ref = load_params(LG_CKPT)
    np.testing.assert_allclose(
        np.asarray(m._matcher_params["layers"][0]["self_attn"]["Wqkv"]
                   ["kernel"]),
        lg_ref["layers"][0]["self_attn"]["Wqkv"]["kernel"])
    sp_ref = load_params(SP_CKPT)
    sp_leaf = jax.tree.leaves(m._sp_params)[0]
    np.testing.assert_allclose(np.asarray(sp_leaf),
                               jax.tree.leaves(sp_ref)[0])

    # explicit opt-out restores random init
    r = LightGlueMatcher({"max_keypoints": 128, "random_weights": True})
    assert not np.allclose(
        np.asarray(r._matcher_params["layers"][0]["self_attn"]["Wqkv"]
                   ["kernel"]),
        lg_ref["layers"][0]["self_attn"]["Wqkv"]["kernel"])
