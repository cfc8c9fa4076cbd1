"""Mesh parallelism tests on the virtual 8-device CPU backend:
mesh construction, sharded epoch step, ring attention parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from icepy4d_tpu.parallel import (make_mesh, make_ring_attention,
                                  make_sharded_match_step, replicate,
                                  shard_batch)


def test_make_mesh_factorizations():
    m = make_mesh(8)
    assert m.shape == {"data": 8, "model": 1}
    m = make_mesh(8, tp=2)
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, dp=3, tp=3)


def test_sharded_match_step_runs():
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.models.superpoint import SuperPoint

    mesh = make_mesh(8, tp=2)
    rng = jax.random.PRNGKey(0)
    sp = SuperPoint(max_keypoints=64, detection_threshold=0.0)
    lg = LightGlue(n_layers=2)
    step = make_sharded_match_step(mesh, sp, lg, n_hypotheses=32)
    r = np.random.default_rng(0)
    ims0 = jnp.asarray(r.uniform(size=(8, 64, 64)), jnp.float32)
    ims1 = jnp.asarray(r.uniform(size=(8, 64, 64)), jnp.float32)
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    out = step(sp.init(rng), lg.init(rng), ims0, ims1, K, K)
    jax.block_until_ready(out)
    assert out["matches0"].shape == (8, 64)
    assert out["points3d"].shape == (8, 64, 3)
    assert out["R"].shape == (8, 3, 3)


def test_ring_attention_matches_single_device():
    from icepy4d_tpu.ops.attention import _xla_attention

    mesh = make_mesh(8, dp=1, tp=8, axis_names=("data", "seq"))
    ring = make_ring_attention(mesh, axis="seq")

    rng = np.random.default_rng(0)
    b, h, n, hd = 2, 4, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, hd)), jnp.float32)
    m = jnp.asarray(rng.uniform(size=(b, n)) > 0.3)

    out_ring = ring(q, k, v, m)
    out_ref = _xla_attention(q, k, v, m)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref),
                               atol=2e-5)


def test_ring_attention_fully_masked_rows_match_reference():
    from icepy4d_tpu.ops.attention import _xla_attention

    mesh = make_mesh(8, dp=1, tp=8, axis_names=("data", "seq"))
    ring = make_ring_attention(mesh, axis="seq")
    rng = np.random.default_rng(1)
    b, h, n, hd = 1, 2, 128, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, hd)), jnp.float32)
    m = jnp.zeros((b, n), bool)  # nothing valid
    out_ring = np.asarray(ring(q, k, v, m))
    out_ref = np.asarray(_xla_attention(q, k, v, m))
    np.testing.assert_allclose(out_ring, out_ref, atol=2e-5)
    assert np.isfinite(out_ring).all()


def test_shard_and_replicate_helpers():
    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))
    p = replicate(mesh, {"w": jnp.ones((3, 3))})
    np.testing.assert_allclose(np.asarray(p["w"]), 1.0)


def test_sequence_parallel_lightglue_matches_dense():
    """Token-sharded LightGlue == dense LightGlue (matches + scores)."""
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.parallel import make_sequence_parallel_lightglue

    mesh = make_mesh(8, dp=1, tp=8, axis_names=("data", "seq"))
    lg = LightGlue(n_layers=2, filter_threshold=0.0, precision="highest")
    params = lg.init(0)
    sp_lg = make_sequence_parallel_lightglue(mesh, lg, axis="seq")

    rng = np.random.default_rng(3)
    b, n = 2, 128
    data = {}
    for s in (0, 1):
        kpts = rng.uniform(0, [640, 480], (b, n, 2)).astype(np.float32)
        d = rng.normal(size=(b, n, 256)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        mask = rng.uniform(size=(b, n)) > 0.2
        data[f"kpts{s}"] = jnp.asarray(kpts)
        data[f"desc{s}"] = jnp.asarray(d)
        data[f"mask{s}"] = jnp.asarray(mask)
        data[f"size{s}"] = jnp.broadcast_to(
            jnp.asarray([640.0, 480.0]), (b, 2))

    dense = lg.match(params, data)
    sp = sp_lg(params, data)

    m0_d = np.asarray(dense["matches0"])
    m0_s = np.asarray(sp["matches0"])
    agree = (m0_d == m0_s).mean()
    assert agree > 0.99, f"matches0 agreement {agree}"
    np.testing.assert_array_equal(np.asarray(dense["matches1"]),
                                  np.asarray(sp["matches1"]))
    ok = m0_d > -1
    np.testing.assert_allclose(np.asarray(sp["mscores0"])[ok],
                               np.asarray(dense["mscores0"])[ok],
                               rtol=1e-3, atol=1e-5)


def test_batched_ba_shards_over_mesh():
    """A season of BA problems sharded over the data axis: one program,
    per-epoch problems on separate devices."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_ba import _make_scene, _problem

    from icepy4d_tpu.ops.ba import lm_solve_batched

    mesh = make_mesh(8)
    probs = []
    for seed in range(8):
        cam_theta, intr, pts, obs = _make_scene(n_pts=60, seed=seed,
                                                noise_px=0.3)
        probs.append(_problem(cam_theta, intr, pts, obs,
                              cam_fixed=jnp.asarray([True, True, False])))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    batched = shard_batch(mesh, batched)
    res = lm_solve_batched(batched, max_iters=30)
    assert res.cost.shape == (8,)
    for i in range(8):
        assert float(res.cost[i]) < float(res.initial_cost[i])


def test_sequence_parallel_superglue_matches_dense():
    """Token-sharded SuperGlue (rows-sharded Sinkhorn) == dense."""
    from icepy4d_tpu.models.superglue import SuperGlue
    from icepy4d_tpu.parallel import make_sequence_parallel_superglue

    mesh = make_mesh(8, dp=1, tp=8, axis_names=("data", "seq"))
    sg = SuperGlue(sinkhorn_iterations=15, match_threshold=0.0,
                   precision="highest")
    params = sg.init(0)
    sp_sg = make_sequence_parallel_superglue(mesh, sg, axis="seq")

    rng = np.random.default_rng(4)
    b, n = 2, 128
    data = {}
    for s in (0, 1):
        kpts = rng.uniform(0, [640, 480], (b, n, 2)).astype(np.float32)
        d = rng.normal(size=(b, n, 256)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        mask = rng.uniform(size=(b, n)) > 0.2
        data[f"kpts{s}"] = jnp.asarray(kpts)
        data[f"desc{s}"] = jnp.asarray(d)
        data[f"scores{s}"] = jnp.asarray(
            rng.uniform(size=(b, n)).astype(np.float32))
        data[f"mask{s}"] = jnp.asarray(mask)
        data[f"size{s}"] = jnp.broadcast_to(
            jnp.asarray([640.0, 480.0]), (b, 2))

    dense = sg.match(params, data)
    sp = sp_sg(params, data)
    m0_d = np.asarray(dense["matches0"])
    m0_s = np.asarray(sp["matches0"])
    agree = (m0_d == m0_s).mean()
    assert agree > 0.99, f"matches0 agreement {agree}"
    ok = m0_d > -1
    np.testing.assert_allclose(np.asarray(sp["mscores0"])[ok],
                               np.asarray(dense["mscores0"])[ok],
                               rtol=1e-3, atol=1e-5)
    m1_agree = (np.asarray(dense["matches1"])
                == np.asarray(sp["matches1"])).mean()
    assert m1_agree > 0.99, f"matches1 agreement {m1_agree}"


def test_pipeline_parallel_lightglue_matches_dense():
    """GPipe-staged layers over a 4-stage pp axis == the single-device
    forward, for a streamed 8-pair batch (2 pairs/microbatch)."""
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.parallel.lightglue_pp import (
        make_pipeline_parallel_lightglue)

    mesh = make_mesh(4, dp=4, tp=1, axis_names=("pp", "unused"))
    lg = LightGlue(n_layers=8, precision="highest")
    params = lg.init(jax.random.PRNGKey(0))

    r = np.random.default_rng(5)
    b, n, d = 8, 32, 256
    data = {
        "kpts0": jnp.asarray(r.uniform(0, 64, (b, n, 2)), jnp.float32),
        "kpts1": jnp.asarray(r.uniform(0, 64, (b, n, 2)), jnp.float32),
        "desc0": jnp.asarray(r.normal(size=(b, n, d)), jnp.float32),
        "desc1": jnp.asarray(r.normal(size=(b, n, d)), jnp.float32),
        "mask0": jnp.asarray(r.uniform(size=(b, n)) < 0.9),
        "mask1": jnp.asarray(r.uniform(size=(b, n)) < 0.9),
        "size0": jnp.broadcast_to(jnp.asarray([64.0, 64.0]), (b, 2)),
        "size1": jnp.broadcast_to(jnp.asarray([64.0, 64.0]), (b, 2)),
    }

    ref = lg.match(params, data)
    pp = make_pipeline_parallel_lightglue(mesh, lg, axis="pp")
    out = pp(params, data)

    np.testing.assert_array_equal(np.asarray(out["matches0"]),
                                  np.asarray(ref["matches0"]))
    np.testing.assert_allclose(np.asarray(out["mscores0"]),
                               np.asarray(ref["mscores0"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["log_assignment"]),
                               np.asarray(ref["log_assignment"]),
                               atol=1e-4)


def test_pipeline_parallel_rejects_bad_split():
    from icepy4d_tpu.models.lightglue import LightGlue
    from icepy4d_tpu.parallel.lightglue_pp import (
        make_pipeline_parallel_lightglue)

    mesh = make_mesh(4, dp=4, tp=1, axis_names=("pp", "unused"))
    with pytest.raises(ValueError):
        make_pipeline_parallel_lightglue(mesh, LightGlue(n_layers=9))


def test_pipeline_parallel_loftr_coarse_matches_dense():
    """Staged LoFTR coarse transformer == batched lft_apply."""
    from icepy4d_tpu.models.loftr import LoFTR, lft_apply
    from icepy4d_tpu.parallel.loftr_pp import (
        make_pipeline_parallel_loftr_coarse)

    mesh = make_mesh(4, dp=4, tp=1, axis_names=("pp", "unused"))
    model = LoFTR(coarse_pairs=4, precision="highest")
    params = model.init(0)

    r = np.random.default_rng(7)
    b, l, d = 8, 48, 256
    c0 = jnp.asarray(r.normal(size=(b, l, d)), jnp.float32)
    c1 = jnp.asarray(r.normal(size=(b, l, d)), jnp.float32)
    m0 = jnp.asarray(r.uniform(size=(b, l)) < 0.9)
    m1 = jnp.asarray(r.uniform(size=(b, l)) < 0.9)

    ref0, ref1 = jax.vmap(
        lambda a, c, ma, mb_: lft_apply(
            params["coarse"], a[None], c[None], ma[None], mb_[None],
            model.nhead, model.coarse_pairs)
    )(c0, c1, m0, m1)
    ref0 = ref0[:, 0]
    ref1 = ref1[:, 0]

    pp = make_pipeline_parallel_loftr_coarse(mesh, model, axis="pp")
    got0, got1 = pp(params["coarse"], c0, c1, m0, m1)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               atol=2e-4)
