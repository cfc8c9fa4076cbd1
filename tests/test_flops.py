"""Pin the analytic FLOP formulas against XLA's own cost analysis.

bench.py reports MFU from model FLOPs / wall time. Through the remote
axon tunnel `Lowered.cost_analysis()` fails (the local client cannot
analyse for the remote backend), so the models carry analytic matmul
FLOP methods (SuperPoint.extract_flops, LightGlue.match_flops). These
tests compile the same programs on the CPU backend — where
cost_analysis works — and require the analytic count to agree within a
few percent (the residual is elementwise/softmax/NMS work the formulas
deliberately exclude).
"""

import jax
import jax.numpy as jnp
import pytest


def _xla_flops(fn, *args) -> float:
    return float(jax.jit(fn).lower(*args).compile().cost_analysis()["flops"])


@pytest.mark.parametrize("h,w,batch", [(128, 160, 1), (64, 64, 3)])
def test_superpoint_extract_flops_matches_xla(h, w, batch):
    from icepy4d_tpu.models.superpoint import SuperPoint

    sp = SuperPoint(max_keypoints=64)
    params = sp.init(jax.random.PRNGKey(0), h, w)
    xla = _xla_flops(
        lambda p, x: sp.extract(p, x), params,
        jax.ShapeDtypeStruct((batch, h, w), jnp.float32))
    analytic = sp.extract_flops(h, w, batch=batch)
    assert analytic == pytest.approx(xla, rel=0.05)


@pytest.mark.parametrize("b,m,n", [(2, 256, 256), (1, 128, 192)])
def test_lightglue_match_flops_matches_xla(b, m, n):
    """n_layers=1: XLA's cost analysis counts a lax.scan body exactly
    once regardless of trip count (verified by probe), so only L=1 can
    be pinned directly; linearity in L is explicit in the formula."""
    from icepy4d_tpu.models.lightglue import LightGlue

    lg = LightGlue(n_layers=1)
    params = lg.init(0)
    sd = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    data = {
        "kpts0": sd(b, m, 2), "kpts1": sd(b, n, 2),
        "desc0": sd(b, m, lg.input_dim), "desc1": sd(b, n, lg.input_dim),
        "mask0": jax.ShapeDtypeStruct((b, m), jnp.bool_),
        "mask1": jax.ShapeDtypeStruct((b, n), jnp.bool_),
        "size0": sd(b, 2), "size1": sd(b, 2),
    }
    xla = _xla_flops(lambda p, d: lg.match(p, d), params, data)
    analytic = lg.match_flops(b, m, n)
    assert analytic == pytest.approx(xla, rel=0.05)
