"""Staged (disjoint-submesh) pipeline + multi-process distribution.

The two-process test spawns real subprocesses with
``jax.distributed.initialize`` on the CPU backend (Gloo collectives) —
the same code path a multi-slice TPU pod uses over DCN.
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icepy4d_tpu.parallel import (EpochShard, StagedPipeline,
                                  partition_epochs, split_devices)


# ---------------------------------------------------------------------------
# staged extract/match pipeline
# ---------------------------------------------------------------------------

def test_split_devices_disjoint():
    mesh_a, mesh_b = split_devices(split=0.5)
    da = set(mesh_a.devices.flat)
    db = set(mesh_b.devices.flat)
    assert da and db and not (da & db)
    assert len(da) + len(db) == len(jax.devices())


def test_staged_pipeline_matches_sequential():
    """SuperPoint on submesh A -> NN matcher on submesh B; outputs equal
    the plain single-program path, stage outputs live on their group."""
    from icepy4d_tpu.models.superpoint import SuperPoint

    sp = SuperPoint(max_keypoints=64, detection_threshold=0.0)
    params = sp.init(jax.random.PRNGKey(0))

    def extract(batch):
        f0 = sp.net.apply(params, batch["im0"][..., None])
        f1 = sp.net.apply(params, batch["im1"][..., None])
        return {"d0": f0[1], "d1": f1[1]}  # dense descriptors

    def match(feats):
        d0 = feats["d0"].reshape(feats["d0"].shape[0], -1, 256)
        d1 = feats["d1"].reshape(feats["d1"].shape[0], -1, 256)
        sim = jnp.einsum("bmd,bnd->bmn", d0, d1)
        return jnp.argmax(sim, -1)

    pipe = StagedPipeline(extract, match, split=0.5)

    r = np.random.default_rng(0)
    batches = [
        {"im0": jnp.asarray(r.uniform(size=(4, 32, 32)), jnp.float32),
         "im1": jnp.asarray(r.uniform(size=(4, 32, 32)), jnp.float32)}
        for _ in range(3)
    ]
    outs = pipe.run(batches)
    assert len(outs) == 3
    for b, o in zip(batches, outs):
        ref = match(extract(b))
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref))
        # result lives on the match submesh
        assert set(o.sharding.device_set) <= set(pipe.mesh_b.devices.flat)


# ---------------------------------------------------------------------------
# epoch partitioning
# ---------------------------------------------------------------------------

def test_partition_epochs_balanced_and_complete():
    for n, pc in [(10, 4), (8, 8), (3, 4), (160, 4)]:
        shards = [partition_epochs(n, pi, pc) for pi in range(pc)]
        covered = [i for s in shards for i in s.indices]
        assert covered == list(range(n))
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1


def test_partition_epochs_single_process_default():
    s = partition_epochs(7)
    assert isinstance(s, EpochShard)
    assert list(s.indices) == list(range(7))


# ---------------------------------------------------------------------------
# real multi-process jax.distributed (2 CPU processes, Gloo collectives)
# ---------------------------------------------------------------------------

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    from icepy4d_tpu.parallel import (all_gather_host, global_mesh,
                                      init_distributed, partition_epochs)

    ok = init_distributed(coordinator_address="localhost:{port}",
                          num_processes=2, process_id=int(sys.argv[1]))
    assert ok
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    mesh = global_mesh(axis_names=("epoch", "data"))
    assert dict(mesh.shape) == {{"epoch": 2, "data": 2}}

    # each process runs its epoch shard, then summaries are all-gathered
    shard = partition_epochs(6)
    import numpy as np
    local = np.asarray(
        [float(e) for e in shard.indices], np.float32)  # 3 epochs each
    out = all_gather_host({{"epoch_rmse": local}})
    got = out["epoch_rmse"]
    assert got.shape == (2, 3), got.shape
    np.testing.assert_allclose(got.ravel(), np.arange(6.0))
    print("WORKER_OK", sys.argv[1], flush=True)
""")


def test_two_process_distributed_season():
    import os

    # pid-derived port: a fixed one collides with TIME_WAIT sockets
    # when the suite re-runs back-to-back
    port = 29000 + (os.getpid() % 900)
    code = _WORKER.format(repo="/root/repo", port=port)
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"WORKER_OK {i}" in out
