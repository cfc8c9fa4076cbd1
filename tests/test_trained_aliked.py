"""Guard the committed self-trained ALIKED checkpoint.

weights/aliked_synthetic.npz is a build artifact
(scripts/train_aliked.py); these tests pin its BEHAVIOR so a broken
retrain or a corrupted file cannot silently ship: on homography pairs
its detections must repeat and its SDDH descriptors must produce
substantially more correct mutual-NN matches than a random-weights
model (the registry default before training). Pattern mirrors
tests/test_trained_lightglue.py.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WEIGHTS = Path(__file__).resolve().parents[1] / "weights"
CKPT = WEIGHTS / "aliked_synthetic.npz"

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="self-trained ALIKED checkpoint not present")


def _eval_pairs(model, params, n_pairs=8, h=240, w=320, k=256,
                tol_px=3.0, seed=20260819):
    """Homography-pair matching score: extract on image and warp,
    mutual-NN match descriptors, count matches whose warped position
    agrees with the homography within tol_px. Returns (match_rate,
    n_total_valid)."""
    from icepy4d_tpu.training.aliked_train import warp_points
    from icepy4d_tpu.training.synthetic import make_pair_batch

    rng = np.random.default_rng(seed)
    imgs, warped, Hs, _ = make_pair_batch(rng, n_pairs, h, w)
    fA = model.extract(params, jnp.asarray(imgs))
    fB = model.extract(params, jnp.asarray(warped))

    correct = total = 0
    for b in range(n_pairs):
        mA, mB = np.asarray(fA["mask"][b]), np.asarray(fB["mask"][b])
        dA, dB = np.asarray(fA["descriptors"][b]), np.asarray(
            fB["descriptors"][b])
        kA, kB = np.asarray(fA["keypoints"][b]), np.asarray(
            fB["keypoints"][b])
        sim = dA @ dB.T
        sim[~mA] = -2
        sim[:, ~mB] = -2
        nn0, nn1 = sim.argmax(1), sim.argmax(0)
        mutual = nn1[nn0] == np.arange(len(nn0))
        sel = mutual & mA & (sim.max(1) > -1)
        kAw = np.asarray(warp_points(jnp.asarray(kA), jnp.asarray(Hs[b])))
        inb = (kAw[:, 0] >= 0) & (kAw[:, 0] < w) & \
              (kAw[:, 1] >= 0) & (kAw[:, 1] < h)
        sel &= inb
        err = np.linalg.norm(kAw - kB[nn0], axis=1)
        correct += int((sel & (err < tol_px)).sum())
        total += int(sel.sum())
    return correct / max(total, 1), total


@pytest.mark.slow
def test_checkpoint_matches_homography_pairs():
    from icepy4d_tpu.models.aliked import ALIKED
    from icepy4d_tpu.models.convert import load_params

    model = ALIKED(max_keypoints=256, detection_threshold=0.0)
    params = jax.tree.map(jnp.asarray, load_params(CKPT))
    rate, total = _eval_pairs(model, params)

    rand_params = model.init(jax.random.PRNGKey(3))
    rand_rate, _ = _eval_pairs(model, rand_params)

    assert total > 200, (rate, total)
    # absolute floor + clear margin over the untrained model
    assert rate > 0.5, (rate, rand_rate, total)
    assert rate > rand_rate + 0.15, (rate, rand_rate, total)


def test_checkpoint_is_registry_default(monkeypatch):
    """A weight-less {'extractor': 'aliked'} matcher must load the
    committed checkpoint by default (matchers.py bundled_checkpoint)."""
    from icepy4d_tpu.matching.matchers import NearestNeighborMatcher
    from icepy4d_tpu.models.convert import load_params

    monkeypatch.setenv("ICEPY4D_RANDOM_WEIGHTS", "0")
    m = NearestNeighborMatcher({"extractor": "aliked",
                                "max_keypoints": 128})
    ref = load_params(CKPT)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(m._sp_params)[0]),
        np.asarray(jax.tree.leaves(ref)[0]))
