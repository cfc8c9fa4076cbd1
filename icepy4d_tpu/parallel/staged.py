"""Two-stage extract/match pipeline on disjoint device groups.

SURVEY §2.12's "stage SuperPoint -> matcher across device groups" item.
The extractor (conv-heavy, HBM-bandwidth bound) and the matcher
(attention, MXU bound) get DISJOINT submeshes; epoch pair-batches
stream through:

  extract(epoch t+1) on group A  ||  match(epoch t) on group B

JAX's async dispatch provides the overlap for free: each stage is its
own jitted program placed on its submesh via shardings, the handoff is
one device_put (ICI transfer A -> B), and because dispatch returns
before execution completes, enqueueing extract(t+1) while match(t) is
in flight pipelines the hardware. No collectives inside either stage
are harmed: each submesh keeps its own data axis.

    pipe = StagedPipeline(extract_fn, match_fn, split=0.5)
    outs = pipe.run(batches)     # same results as sequential calls
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def split_devices(devices=None, split: float = 0.5,
                  axis_names=("data",)) -> tuple[Mesh, Mesh]:
    """Split a device list into (extract_mesh, match_mesh)."""
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) < 2:
        raise ValueError("staged pipeline needs >= 2 devices")
    k = max(1, min(len(devs) - 1, int(round(len(devs) * split))))
    mk = lambda d: Mesh(np.asarray(d).reshape(len(d)), axis_names)
    return mk(devs[:k]), mk(devs[k:])


@dataclass
class StagedPipeline:
    """extract_fn(batch) runs on mesh A; match_fn(feats) on mesh B.

    extract_fn / match_fn are plain jittable callables; this class jits
    them with shardings pinned to their submesh (leading axis over
    'data') and overlaps stages across the stream via async dispatch.
    """

    extract_fn: Callable[[Any], Any]
    match_fn: Callable[[Any], Any]
    devices: Sequence | None = None
    split: float = 0.5
    donate_handoff: bool = True

    def __post_init__(self):
        self.mesh_a, self.mesh_b = split_devices(self.devices, self.split)
        self._shard_a = NamedSharding(self.mesh_a, P("data"))
        self._shard_b = NamedSharding(self.mesh_b, P("data"))
        self._repl_b = NamedSharding(self.mesh_b, P())
        self._extract = jax.jit(self.extract_fn,
                                out_shardings=self._shard_a)
        self._match = jax.jit(self.match_fn,
                              out_shardings=self._shard_b)

    def _handoff(self, feats):
        """A -> B transfer (async; overlaps with A's next batch)."""
        return jax.tree.map(
            lambda a: jax.device_put(a, self._shard_b), feats)

    def run(self, batches: Iterable, prefetch: int = 2) -> list:
        """Stream batches through both stages; returns match outputs in
        order. With async dispatch, stage A works `prefetch` batches
        ahead of stage B."""
        results: list = []
        in_flight: list = []
        for batch in batches:
            batch = jax.tree.map(
                lambda a: jax.device_put(a, self._shard_a), batch)
            feats = self._extract(batch)
            in_flight.append(self._match(self._handoff(feats)))
            while len(in_flight) > prefetch:
                results.append(jax.block_until_ready(in_flight.pop(0)))
        results.extend(jax.block_until_ready(r) for r in in_flight)
        return results
