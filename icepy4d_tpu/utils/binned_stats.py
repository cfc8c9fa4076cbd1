"""2-D/3-D spatial binned statistics (ref utils/binned_stats.py:12-310).

Mean/std/count per cell for scattered values — used for velocity-field
analysis of the 4D products. Device scatter-add implementation (one
fused program), matplotlib plotting helper on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("shape",))
def _binned(coords: jnp.ndarray, values: jnp.ndarray, mins: jnp.ndarray,
            res: jnp.ndarray, shape: tuple):
    nd = len(shape)
    idx = jnp.floor((coords - mins) / res).astype(jnp.int32)
    ok = jnp.all((idx >= 0) & (idx < jnp.asarray(shape)), axis=1) \
        & jnp.isfinite(values) & jnp.all(jnp.isfinite(coords), axis=1)
    strides = np.concatenate(
        [np.cumprod(shape[::-1])[:-1][::-1], [1]]).astype(np.int32)
    lin = jnp.where(ok, idx @ jnp.asarray(strides), int(np.prod(shape)))
    size = int(np.prod(shape)) + 1
    cnt = jnp.zeros((size,)).at[lin].add(ok.astype(jnp.float32))
    s1 = jnp.zeros((size,)).at[lin].add(jnp.where(ok, values, 0.0))
    s2 = jnp.zeros((size,)).at[lin].add(jnp.where(ok, values ** 2, 0.0))
    cntc = jnp.maximum(cnt[:-1], 1.0)
    mean = s1[:-1] / cntc
    var = jnp.maximum(s2[:-1] / cntc - mean ** 2, 0.0)
    return (mean.reshape(shape), jnp.sqrt(var).reshape(shape),
            cnt[:-1].reshape(shape))


def binned_statistic(
    coords: np.ndarray,
    values: np.ndarray,
    step: float | tuple,
    bounds: list[tuple] | None = None,
) -> dict:
    """Bin scattered `values` at `coords` (N, D) into a D-dim grid.

    Returns dict(mean, std, count, edges) with NaN where empty."""
    coords = np.asarray(coords, np.float32)
    values = np.asarray(values, np.float32).reshape(-1)
    nd = coords.shape[1]
    step = np.broadcast_to(np.asarray(step, np.float32), (nd,))
    if bounds is None:
        bounds = [(float(np.nanmin(coords[:, d])),
                   float(np.nanmax(coords[:, d]))) for d in range(nd)]
    mins = np.asarray([b[0] for b in bounds], np.float32)
    shape = tuple(max(int(np.ceil((b[1] - b[0]) / s)), 1)
                  for b, s in zip(bounds, step))
    mean, std, cnt = _binned(jnp.asarray(coords), jnp.asarray(values),
                             jnp.asarray(mins), jnp.asarray(step), shape)
    mean = np.array(mean)
    std = np.array(std)
    cnt = np.array(cnt)
    mean[cnt == 0] = np.nan
    std[cnt == 0] = np.nan
    edges = [mins[d] + np.arange(shape[d] + 1) * step[d]
             for d in range(nd)]
    return {"mean": mean, "std": std, "count": cnt, "edges": edges}


def plot_binned_stat(stat: dict, ax=None, what: str = "mean",
                     cmap: str = "viridis", **imshow_kw):
    """Show a 2-D binned statistic (host, matplotlib)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    ex, ey = stat["edges"][:2]
    im = ax.imshow(stat[what].T, origin="lower", cmap=cmap,
                   extent=[ex[0], ex[-1], ey[0], ey[-1]], **imshow_kw)
    ax.figure.colorbar(im, ax=ax, label=what)
    return ax
