"""LightGlue self-training (training/lightglue_train.py).

No reference counterpart (the reference downloads the official
checkpoint); correctness is established behaviorally: ground-truth
assignment construction is verified against a known permutation, the
loss prefers correct assignments, and a tiny LightGlue trained on
synthetic correspondence data must actually learn to match (high
precision/recall on held-out pairs, far above its random init).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icepy4d_tpu.models.lightglue import LightGlue
from icepy4d_tpu.training.lightglue_train import (
    assignment_nll,
    evaluate_matching,
    gt_assignment,
    make_lightglue_dataset,
    train_lightglue,
)


def test_gt_assignment_known_permutation():
    rng = np.random.default_rng(0)
    M = N = 40
    kpts0 = rng.uniform(20, 200, (1, M, 2)).astype(np.float32)
    perm = rng.permutation(M)
    H = np.array([[1.1, 0.02, 5.0], [-0.01, 0.95, -3.0], [0, 0, 1]],
                 np.float32)
    ones = np.ones((M, 1), np.float32)
    p = np.concatenate([kpts0[0], ones], -1) @ H.T
    p = p[:, :2] / p[:, 2:]
    kpts1 = np.empty((1, N, 2), np.float32)
    kpts1[0, perm] = p + rng.normal(0, 0.3, (M, 2))
    # make the last 5 of side 1 far-away clutter (unmatchable)
    kpts1[0, perm[:5]] += 500.0
    mask = np.ones((1, M), bool)
    gt0, unm0, unm1 = jax.tree.map(np.asarray, gt_assignment(
        jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(H)[None],
        jnp.asarray(mask), jnp.asarray(mask)))
    # the 35 undisturbed points map exactly through the permutation
    good = np.ones(M, bool)
    good[:5] = False           # their targets were moved away
    assert (gt0[0, good] == perm[good]).all()
    assert (gt0[0, ~good] == -1).all()
    assert unm0[0, ~good].all()
    assert not unm0[0, good].any()
    assert unm1[0, perm[:5]].all()


def test_gt_assignment_respects_masks():
    rng = np.random.default_rng(1)
    kpts = rng.uniform(0, 100, (1, 16, 2)).astype(np.float32)
    H = np.eye(3, dtype=np.float32)[None]
    mask0 = np.ones((1, 16), bool)
    mask1 = np.ones((1, 16), bool)
    mask1[0, 8:] = False       # padded side-1 entries
    gt0, unm0, unm1 = gt_assignment(
        jnp.asarray(kpts), jnp.asarray(kpts), jnp.asarray(H),
        jnp.asarray(mask0), jnp.asarray(mask1))
    gt0 = np.asarray(gt0)
    assert (gt0[0, :8] == np.arange(8)).all()
    assert (gt0[0, 8:] == -1).all()          # their match is masked out
    assert not np.asarray(unm1)[0, 8:].any()  # padding is not "unmatchable"


def test_assignment_nll_prefers_truth():
    rng = np.random.default_rng(2)
    M = N = 12
    gt0 = jnp.asarray(np.arange(M), jnp.int32)[None]
    unm = jnp.zeros((1, M), bool)
    good = np.full((1, M + 1, N + 1), -8.0, np.float32)
    good[0, np.arange(M), np.arange(N)] = -0.05
    bad = np.full((1, M + 1, N + 1), np.log(1.0 / (N + 1)), np.float32)
    nll_good = float(assignment_nll(jnp.asarray(good), gt0, unm, unm))
    nll_bad = float(assignment_nll(jnp.asarray(bad), gt0, unm, unm))
    assert nll_good < nll_bad


def _synthetic_descriptor_dataset(rng, n_batches, batch, M=64, d=64,
                                  noise=0.15, n_clutter=12):
    """Correspondence batches with LEARNABLE structure: descriptors of
    corresponding keypoints are noisy copies on the unit sphere;
    clutter points on each side have independent descriptors."""
    size = np.tile(np.asarray([160.0, 120.0], np.float32),
                   (n_batches, batch, 1))
    ds = {"kpts0": [], "desc0": [], "kpts1": [], "desc1": [], "H": []}
    for _ in range(n_batches * batch):
        k0 = rng.uniform(10, 110, (M, 2)).astype(np.float32)
        d0 = rng.normal(size=(M, d)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        H = np.eye(3, dtype=np.float32)
        H[:2, 2] = rng.uniform(-8, 8, 2)
        k1 = k0 + H[:2, 2]
        d1 = d0 + noise * rng.normal(size=(M, d)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        # replace the tail with clutter (GT-unmatchable)
        k1[-n_clutter:] = rng.uniform(10, 110, (n_clutter, 2))
        c = rng.normal(size=(n_clutter, d)).astype(np.float32)
        d1[-n_clutter:] = c / np.linalg.norm(c, axis=1, keepdims=True)
        perm = rng.permutation(M)
        ds["kpts0"].append(k0)
        ds["desc0"].append(d0)
        ds["kpts1"].append(k1[perm])
        ds["desc1"].append(d1[perm])
        ds["H"].append(H)
    out = {k: np.stack(v).reshape(n_batches, batch, *v[0].shape)
           for k, v in ds.items()}
    out["mask0"] = np.ones((n_batches, batch, M), bool)
    out["mask1"] = np.ones((n_batches, batch, M), bool)
    out["size0"] = size
    out["size1"] = size
    return out


@pytest.mark.slow
def test_training_learns_to_match():
    rng = np.random.default_rng(3)
    model = LightGlue(n_layers=3, num_heads=2, descriptor_dim=64,
                      input_dim=64, filter_threshold=0.1)
    train_ds = _synthetic_descriptor_dataset(rng, n_batches=24, batch=8)
    test_ds = _synthetic_descriptor_dataset(rng, n_batches=2, batch=8)

    init_params = model.init(0)
    before = evaluate_matching(model, init_params, test_ds)
    params, history = train_lightglue(
        model, train_ds, steps=1200, lr=1e-3, scan_chunk=400,
        log=lambda *a: None)
    after = evaluate_matching(model, params, test_ds)

    assert history[-1]["loss"] < history[0]["chunk_mean"]
    assert after["recall"] > 0.7, (before, after)
    assert after["precision"] > 0.7, (before, after)
    assert after["recall"] > before["recall"] + 0.3


def test_dataset_builder_shapes_and_gt():
    """make_lightglue_dataset plumbing: shapes, masks, and enough GT
    matches to train on (SuperPoint random weights still detect
    SOMETHING; the builder itself must produce consistent pairs)."""
    from icepy4d_tpu.models.superpoint import SuperPoint

    rng = np.random.default_rng(4)
    sp = SuperPoint(max_keypoints=128, detection_threshold=0.0)
    sp_params = sp.init(jax.random.PRNGKey(0))
    ds = make_lightglue_dataset(
        rng, lambda imgs: sp.extract(sp_params, imgs),
        n_batches=2, batch=2, h=120, w=160, extract_chunk=4)
    assert ds["kpts0"].shape == (2, 2, 128, 2)
    assert ds["desc0"].shape == (2, 2, 128, 256)
    assert ds["mask0"].dtype == bool
    assert ds["H"].shape == (2, 2, 3, 3)
    gt0, _, _ = gt_assignment(
        jnp.asarray(ds["kpts0"][0]), jnp.asarray(ds["kpts1"][0]),
        jnp.asarray(ds["H"][0]), jnp.asarray(ds["mask0"][0]),
        jnp.asarray(ds["mask1"][0]))
    assert int((np.asarray(gt0) >= 0).sum()) > 0
