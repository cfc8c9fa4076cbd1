"""Mesh construction and sharding helpers.

Axes:
  data  — stereo pairs / epochs / tile pairs (pure DP; no cross-device
          communication in the matcher forward)
  model — attention heads of LightGlue/SuperGlue (TP; XLA inserts
          all-gathers/psums over ICI where layouts demand it)

The reference has no distributed runtime at all (SURVEY.md §2.12); this
module is the TPU-native replacement for its sequential epoch loop.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    dp: int | None = None,
    tp: int | None = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first `n_devices` devices.

    By default all devices go to the data axis (matching is embarrassingly
    parallel over pairs); pass tp>1 to shard attention heads too.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != n_devices={n}")
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. model params) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard every leaf's leading dim over `axis`; leading dims must be
    divisible by the axis size (pad batches to the mesh size upstream)."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
