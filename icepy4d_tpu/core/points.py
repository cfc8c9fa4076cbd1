"""3D point containers — mirrors the Features two-level design.

`PointSet` is the padded device pytree; `Points` the host wrapper with
the reference's API (core/points.py:172-491): append_points_from_numpy,
to_numpy, colors_to_numpy, to_point_cloud, filter by mask/index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class PointSet:
    xyz: Array  # (N, 3) float32
    color: Array  # (N, 3) float32 in [0, 1]
    track_id: Array  # (N,) int32
    mask: Array  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    @property
    def num_valid(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @classmethod
    def empty(cls, capacity: int) -> "PointSet":
        return cls(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            color=jnp.zeros((capacity, 3), jnp.float32),
            track_id=-jnp.ones((capacity,), jnp.int32),
            mask=jnp.zeros((capacity,), bool),
        )

    @classmethod
    def from_arrays(cls, xyz, color=None, track_id=None,
                    capacity: int | None = None) -> "PointSet":
        xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
        n = xyz.shape[0]
        if capacity is None:
            capacity = max(8, 1 << (max(n, 1) - 1).bit_length())
        out = cls.empty(capacity)
        idx = jnp.arange(n)
        out = out.replace(
            xyz=out.xyz.at[idx].set(jnp.asarray(xyz)),
            mask=out.mask.at[idx].set(True),
        )
        if color is not None:
            color = np.asarray(color, np.float32).reshape(-1, 3)
            out = out.replace(color=out.color.at[idx].set(jnp.asarray(color)))
        if track_id is not None:
            out = out.replace(track_id=out.track_id.at[idx].set(
                jnp.asarray(np.asarray(track_id, np.int32).reshape(-1))))
        else:
            out = out.replace(
                track_id=out.track_id.at[idx].set(jnp.arange(n, dtype=jnp.int32)))
        return out


class Points:
    """Host-side growable 3D point store (ref core/points.py:172-491)."""

    def __init__(self):
        self._xyz = np.zeros((0, 3), np.float32)
        self._color = np.zeros((0, 3), np.float32)
        self._track_id = np.zeros((0,), np.int32)
        self._last_track_id = -1

    def __len__(self) -> int:
        return self._xyz.shape[0]

    def __repr__(self) -> str:
        return f"Points({len(self)} points)"

    def append_points_from_numpy(self, coords, track_ids=None, colors=None) -> None:
        coords = np.asarray(coords, np.float32).reshape(-1, 3)
        n = coords.shape[0]
        if track_ids is None:
            track_ids = np.arange(self._last_track_id + 1,
                                  self._last_track_id + 1 + n, dtype=np.int32)
        else:
            track_ids = np.asarray(track_ids, np.int32).reshape(-1)
        if colors is None:
            colors = np.zeros((n, 3), np.float32)
        else:
            colors = np.asarray(colors, np.float32).reshape(-1, 3)
            if colors.max(initial=0.0) > 1.0:
                colors = colors / 255.0
        self._xyz = np.concatenate([self._xyz, coords])
        self._color = np.concatenate([self._color, colors])
        self._track_id = np.concatenate([self._track_id, track_ids])
        if n:
            self._last_track_id = int(max(self._last_track_id, track_ids.max()))

    def to_numpy(self) -> np.ndarray:
        return self._xyz.copy()

    def colors_to_numpy(self, as_uint8: bool = False) -> np.ndarray:
        if as_uint8:
            return (self._color * 255.0).astype(np.uint8)
        return self._color.copy()

    def track_ids_to_numpy(self) -> np.ndarray:
        return self._track_id.copy()

    def get_track_ids(self) -> tuple:
        return tuple(self._track_id.tolist())

    def filter_point_by_mask(self, mask) -> None:
        m = np.asarray(mask, bool).reshape(-1)
        self._xyz = self._xyz[m]
        self._color = self._color[m]
        self._track_id = self._track_id[m]

    def filter_point_by_index(self, indexes) -> None:
        idx = np.asarray(indexes, np.int64).reshape(-1)
        self._xyz = self._xyz[idx]
        self._color = self._color[idx]
        self._track_id = self._track_id[idx]

    def to_point_cloud(self):
        from icepy4d_tpu.core.point_cloud import PointCloud

        return PointCloud(points3d=self._xyz, points_col=self._color)

    def to_padded(self, capacity: int | None = None) -> PointSet:
        return PointSet.from_arrays(self._xyz, color=self._color,
                                    track_id=self._track_id, capacity=capacity)
