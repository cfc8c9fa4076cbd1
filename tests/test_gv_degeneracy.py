"""Degeneracy-aware geometric verification (VERDICT round-1 item 6).

The reference's primary GV is pydegensac with a plane-degeneracy check
(/root/reference/src/icepy4d/matching/geometric_verification.py:64-79);
its fallback is cv2.USAC_MAGSAC sigma-consensus (:87-95). These tests
pin our on-device equivalents:

  - a dominant-plane scene where plain F-RANSAC returns a model that
    only explains the plane while the DEGENSAC path recovers the true
    epipolar geometry (plane-and-parallax);
  - homography RANSAC correctness under outliers;
  - MAGSAC sigma-consensus estimation without a hand-picked threshold;
  - method routing in matching.geometric_verification.
"""

import jax
import numpy as np
import pytest

from icepy4d_tpu.matching.enums import GeometricVerification
from icepy4d_tpu.matching.geometric_verification import geometric_verification
from icepy4d_tpu.ops.ransac import (
    ransac_fundamental,
    ransac_fundamental_degensac,
    ransac_fundamental_magsac,
    ransac_homography,
)


def _sampson_np(F, x0, x1):
    x0h = np.c_[x0, np.ones(len(x0))]
    x1h = np.c_[x1, np.ones(len(x1))]
    Fx0 = x0h @ F.T
    Ftx1 = x1h @ F
    num = np.sum(x1h * Fx0, 1) ** 2
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return num / np.maximum(den, 1e-12)


def make_plane_scene(seed, n_plane=120, n_off=8, noise=0.8, off_noise=0.3):
    """Two-view scene: n_plane points on a slanted plane + n_off free
    points, projected with noise. Returns (x0, x1, F_true, off_mask)."""
    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    a = 0.05
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    t = np.array([1.0, 0.1, 0.2])
    xy = rng.uniform(-2, 2, (n_plane, 2))
    Xp = np.c_[xy, 5 + 0.3 * xy[:, 0] + 0.2 * xy[:, 1]]
    Xo = np.c_[rng.uniform(-2, 2, (n_off, 2)),
               rng.uniform(2.0, 12.0, n_off)]
    X = np.r_[Xp, Xo]

    def proj(X, R, t):
        Xc = X @ R.T + t
        return (Xc[:, :2] / Xc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2],
                                                                K[1, 2]]

    x0 = proj(X, np.eye(3), np.zeros(3))
    x1 = proj(X, R, t)
    sig = np.full(len(X), noise)
    sig[n_plane:] = off_noise
    x0 += rng.normal(0, 1, x0.shape) * sig[:, None]
    x1 += rng.normal(0, 1, x1.shape) * sig[:, None]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F_true = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
    off = np.zeros(len(X), bool)
    off[n_plane:] = True
    return (x0.astype(np.float32), x1.astype(np.float32), F_true, off)


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_degensac_recovers_where_vanilla_fails(seed):
    """Dominant-plane scene: vanilla F-RANSAC locks onto the plane
    (misses the off-plane points), the DEGENSAC path recovers a model
    that explains them (VERDICT item 6 'done' criterion)."""
    x0, x1, F_true, off = make_plane_scene(seed)
    mask = np.ones(len(x0), bool)
    key = jax.random.PRNGKey(seed)
    th = 1.0

    Fv, _ = ransac_fundamental(key, x0, x1, mask, th, 128)
    Fd, inld, degenerate = ransac_fundamental_degensac(
        key, x0, x1, mask, th, 128)

    tol = (3 * 0.3) ** 2  # 3-sigma of the off-plane noise
    recall_v = (_sampson_np(np.asarray(Fv), x0, x1) < tol)[off].mean()
    recall_d = (_sampson_np(np.asarray(Fd), x0, x1) < tol)[off].mean()
    assert bool(degenerate)
    assert recall_v < 0.5          # vanilla fails on off-plane geometry
    assert recall_d > 0.8          # degensac recovers it
    assert int(np.asarray(inld).sum()) >= 8


def test_degensac_keeps_good_model_on_general_scene():
    """Non-degenerate scene: the degeneracy path must not disturb a
    healthy estimate."""
    x0, x1, F_true, _ = make_plane_scene(11, n_plane=30, n_off=90,
                                         noise=0.3, off_noise=0.3)
    mask = np.ones(len(x0), bool)
    key = jax.random.PRNGKey(11)
    F, inl, degenerate = ransac_fundamental_degensac(
        key, x0, x1, mask, 1.5, 512)
    assert not bool(degenerate)
    assert (_sampson_np(np.asarray(F), x0, x1) < 1.5**2).mean() > 0.9


def test_ransac_homography_under_outliers():
    rng = np.random.default_rng(4)
    H_true = np.array([[1.05, 0.02, 3.0], [-0.01, 0.98, -2.0],
                       [1e-5, -2e-5, 1.0]])
    x0 = rng.uniform(0, 500, (128, 2))
    x0h = np.c_[x0, np.ones(len(x0))]
    x1h = x0h @ H_true.T
    x1 = x1h[:, :2] / x1h[:, 2:3]
    x1[:40] = rng.uniform(0, 500, (40, 2))   # 31% outliers
    x0 += rng.normal(0, 0.3, x0.shape)
    x1 += rng.normal(0, 0.3, x1.shape)
    H, inl = ransac_homography(
        jax.random.PRNGKey(0), x0.astype(np.float32),
        x1.astype(np.float32), np.ones(128, bool),
        threshold=3.0, n_hypotheses=512)
    inl = np.asarray(inl)
    assert inl[40:].mean() > 0.9       # inliers kept
    assert inl[:40].mean() < 0.2       # outliers rejected
    # model quality: clean points transfer within ~3-sigma of the noise
    H = np.asarray(H)
    pred = np.c_[x0[40:], np.ones(88)] @ H.T
    pred = pred[:, :2] / pred[:, 2:3]
    assert np.median(np.linalg.norm(pred - x1[40:], axis=1)) < 1.0


def test_magsac_no_threshold_handpicking():
    """Sigma-consensus finds the model across noise scales where a
    single-threshold run needs the threshold tuned to the noise."""
    x0, x1, F_true, _ = make_plane_scene(7, n_plane=20, n_off=100,
                                         noise=0.4, off_noise=0.4)
    # add 20% gross outliers
    rng = np.random.default_rng(7)
    n_out = 24
    x1[:n_out] = rng.uniform(0, 600, (n_out, 2)).astype(np.float32)
    mask = np.ones(len(x0), bool)
    F, inl = ransac_fundamental_magsac(
        jax.random.PRNGKey(2), x0, x1, mask,
        sigma_max=3.0, n_hypotheses=512)
    inl = np.asarray(inl)
    assert inl[:n_out].mean() < 0.2
    assert inl[n_out:].mean() > 0.8
    d = _sampson_np(np.asarray(F), x0, x1)[n_out:]
    assert np.median(d) < 1.0


@pytest.mark.parametrize("method", [
    GeometricVerification.PYDEGENSAC,
    GeometricVerification.MAGSAC,
    GeometricVerification.JAX_RANSAC,
])
def test_geometric_verification_routing(method):
    x0, x1, _, _ = make_plane_scene(3, n_plane=20, n_off=80,
                                    noise=0.3, off_noise=0.3)
    F, inl = geometric_verification(x0, x1, method=method, threshold=2.0)
    assert F is not None and F.shape == (3, 3)
    assert inl.shape == (len(x0),)
    assert inl.mean() > 0.8


@pytest.mark.parametrize("seed", [1, 4])
def test_degensac_recovers_with_gross_outliers(seed):
    """The review scenario: dominant plane + gross putative-match
    OUTLIERS. The epipole bundle must come from F-consistent off-plane
    support (saturated parallax weights), not from the mismatches."""
    x0, x1, F_true, off = make_plane_scene(seed, n_plane=120, n_off=10)
    rng = np.random.default_rng(100 + seed)
    n_out = 25
    xo0 = rng.uniform(0, 640, (n_out, 2)).astype(np.float32)
    xo1 = rng.uniform(0, 480, (n_out, 2)).astype(np.float32)
    x0a = np.r_[x0, xo0]
    x1a = np.r_[x1, xo1]
    mask = np.ones(len(x0a), bool)

    key = jax.random.PRNGKey(seed)
    F, inl, degen = ransac_fundamental_degensac(
        key, x0a, x1a, mask, threshold=1.5,
        n_hypotheses=1024, h_hypotheses=512)
    F = np.asarray(F)
    assert bool(degen)

    # recovered model explains the true off-plane points...
    d_off = _sampson_np(F, x0[off], x1[off])
    assert np.median(d_off) < 1.5 ** 2 * 4
    # ...and rejects the gross outliers
    d_out = _sampson_np(F, xo0, xo1)
    inl_a = np.asarray(inl)
    assert inl_a[len(x0):].sum() <= 2
