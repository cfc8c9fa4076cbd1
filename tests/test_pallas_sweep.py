"""Pallas disparity sweep == XLA streaming sweep (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icepy4d_tpu.ops.dense import _disparity_sweep
from icepy4d_tpu.ops.pallas_sweep import disparity_sweep_pallas


def _pair(h, w, seed=0, shift=5.3):
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(
        rng.uniform(size=(h, w + 40)).astype(np.float32), 2.0)
    I0 = base[:, 20:20 + w]
    # I1(x) = I0(x - shift): under the sweep convention
    # I0(x) = I1(x - d) the true disparity is d = -shift
    xs = np.arange(w) - shift + 20
    x0 = np.floor(xs).astype(int)
    f = xs - x0
    I1 = base[:, x0] * (1 - f) + base[:, x0 + 1] * f
    return jnp.asarray(I0), jnp.asarray(I1.astype(np.float32))


@pytest.mark.parametrize("hw", [(160, 200), (144, 256)])
def test_pallas_sweep_matches_xla(hw):
    h, w = hw
    I0, I1 = _pair(h, w)
    kw = dict(disp_min=jnp.float32(-12.0), disp_max=jnp.float32(12.0),
              pad=16, n_disp=49, window=7)
    ref = _disparity_sweep(I0, I1, **kw)
    got = disparity_sweep_pallas(I0, I1, interpret=True, **kw)

    np.testing.assert_allclose(np.asarray(got["cost"]),
                               np.asarray(ref["cost"]), atol=1e-5)
    # subpixel parabola deltas differ at f32 rounding level (different
    # but equally valid summation orders); 5e-3 px is far below the
    # sweep's quantization step
    np.testing.assert_allclose(np.asarray(got["disparity"]),
                               np.asarray(ref["disparity"]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(got["uniqueness"]),
                               np.asarray(ref["uniqueness"]), atol=5e-3)
    np.testing.assert_array_equal(np.asarray(got["inbounds"]),
                                  np.asarray(ref["inbounds"]))


def test_pallas_sweep_recovers_known_shift():
    I0, I1 = _pair(160, 256, seed=3, shift=5.3)
    out = disparity_sweep_pallas(
        I0, I1, jnp.float32(-12.0), jnp.float32(12.0), 16,
        n_disp=49, window=7, interpret=True)
    d = np.asarray(out["disparity"])
    inb = np.asarray(out["inbounds"])
    center = d[20:-20, 30:-30][inb[20:-20, 30:-30]]
    assert abs(np.median(center) + 5.3) < 0.2
