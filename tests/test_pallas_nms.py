"""Pallas fused NMS kernel == XLA simple_nms + border (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icepy4d_tpu.models.superpoint import simple_nms
from icepy4d_tpu.ops.pallas_nms import (fused_nms_border,
                                        pallas_nms_available)


def _reference(heat, r, border, h0, w0):
    out = simple_nms(heat, r)
    h, w = heat.shape[1:]
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    b = ((ys < border) | (ys >= h0 - border))[:, None] | \
        ((xs < border) | (xs >= w0 - border))[None, :]
    return jnp.where(b[None], 0.0, out)


@pytest.mark.parametrize("shape", [(1, 296, 160), (2, 384, 256),
                                   (1, 260, 136)])
def test_fused_nms_matches_xla(shape):
    rng = np.random.default_rng(0)
    heat = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    r, border = 4, 4
    h0, w0 = shape[1] - 3, shape[2] - 5   # simulate pre-pad extent
    ref = _reference(heat, r, border, h0, w0)
    got = fused_nms_border(heat, r, border, h0, w0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.0)


def test_fused_nms_stripe_boundary_peaks():
    """Peaks exactly at stripe boundaries (rows 127/128/129) must
    suppress across the DMA halo exactly like the global pool."""
    heat = np.zeros((1, 384, 160), np.float32)
    for i, row in enumerate([125, 127, 128, 129, 131, 255, 256]):
        heat[0, row, 40 + i] = 0.5 + 0.05 * i
    heat += np.random.default_rng(1).uniform(
        0, 0.01, heat.shape).astype(np.float32)
    heat = jnp.asarray(heat)
    ref = _reference(heat, 4, 4, 384, 160)
    got = fused_nms_border(heat, 4, 4, 384, 160, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_availability_guard():
    assert not pallas_nms_available(100, 4)
    assert pallas_nms_available(300, 4)
    with pytest.raises(ValueError):
        fused_nms_border(jnp.zeros((1, 64, 64)), 4, 4, 64, 64,
                         interpret=True)
