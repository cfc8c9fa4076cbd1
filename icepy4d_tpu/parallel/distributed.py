"""Multi-process / multi-slice distribution (SURVEY §2.12 DCN item).

The reference processes its 4-D season strictly sequentially on one
host. On TPU pods, slices are separate processes joined by
``jax.distributed``: ICI collectives inside a slice, DCN between
slices. This module is the multi-slice story:

- ``init_distributed``: ``jax.distributed.initialize`` wrapper (env-var
  or explicit addressing). After it, ``jax.devices()`` spans every
  slice and one global Mesh can lay the epoch/data axis across DCN.
- ``global_mesh``: mesh over ALL processes' devices, slice-major, so
  axes named first move across DCN (epochs — embarrassingly parallel,
  one transfer per season) and inner axes stay on ICI.
- ``partition_epochs``: contiguous per-process epoch ranges — each
  slice runs its sub-season with the standard pipeline, reduction
  happens at the end (checkpoints land in a shared filesystem keyed by
  epoch, exactly like the single-process resume path).
- ``all_gather_host``: gather small per-process result pytrees to every
  process with one psum over a zero-padded global buffer (DCN-friendly:
  O(bytes * processes), no host round-trips).

Epoch distribution = data parallelism over DCN: no gradient exchange
exists in this workload, so inter-slice traffic is only the final
gather of (small) per-epoch summaries — the design scales linearly in
slices until IO binds.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize the multi-process runtime. Returns True if a
    multi-process setup was initialized, False for single-process runs
    (explicit args absent and no cluster env detected).

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (set by launchers; TPU pod slices auto-detect).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(axis_names=("epoch", "data"),
                axis_sizes=None) -> Mesh:
    """Mesh over every device of every process, slice-major.

    Default: first axis = number of processes (slices, over DCN),
    second axis = local devices (ICI). Pass axis_sizes to override.
    """
    devs = jax.devices()
    if axis_sizes is None:
        n_proc = jax.process_count()
        axis_sizes = (n_proc, len(devs) // n_proc)
    if int(np.prod(axis_sizes)) != len(devs):
        raise ValueError(f"{axis_sizes} != {len(devs)} devices")
    return Mesh(np.asarray(devs).reshape(axis_sizes), axis_names)


@dataclass(frozen=True)
class EpochShard:
    """This process's contiguous slice of the season."""

    start: int
    stop: int

    @property
    def indices(self) -> range:
        return range(self.start, self.stop)

    def __len__(self) -> int:
        return self.stop - self.start


def partition_epochs(n_epochs: int,
                     process_index: int | None = None,
                     process_count: int | None = None) -> EpochShard:
    """Contiguous epoch range for one process; remainder spreads over
    the first processes (balanced to ±1)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_epochs, pc)
    start = pi * base + min(pi, rem)
    return EpochShard(start, start + base + (1 if pi < rem else 0))


def all_gather_host(tree):
    """Gather a per-process pytree of equal-shape host arrays to EVERY
    process: each leaf (shape s) comes back as (process_count, *s).

    Implementation: a 1-D mesh with ONE device per process holds each
    process's row; resharding to replicated makes XLA emit the
    all-gather (DCN traffic = bytes * processes — this is the
    end-of-season summary exchange, not a hot path)."""
    pc = jax.process_count()
    if pc == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None], tree)
    pi = jax.process_index()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    one_per_proc = [next(d for d in devs if d.process_index == p)
                    for p in range(pc)]
    mesh = Mesh(np.asarray(one_per_proc), ("proc",))

    def gather_leaf(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("proc", *([None] * x.ndim)))
        arr = jax.make_array_from_single_device_arrays(
            (pc,) + x.shape, sharding,
            [jax.device_put(x[None], one_per_proc[pi])])
        out = jax.jit(lambda a: a,
                      out_shardings=NamedSharding(mesh, P()))(arr)
        return np.asarray(jax.device_get(out))

    return jax.tree.map(gather_leaf, tree)
