"""Feature containers.

Two-level design replacing the reference's per-feature object dict
(core/features.py:208-681):

  * `FeatureSet` — the device-side representation: fixed-capacity,
    padded struct-of-arrays pytree {xy, descr, score, track_id, mask}.
    Static shapes make it jit/vmap/shard_map ready; `mask` marks valid
    rows. This is what every matcher/SfM kernel consumes.

  * `Features` — host-side growable wrapper with the reference's
    ergonomics (append_features_from_numpy, to_numpy, kpts_to_numpy,
    descr_to_numpy, filter_feature_by_mask, save/load) backed by numpy;
    converts to/from FeatureSet.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class FeatureSet:
    xy: Array  # (N, 2) float32 pixel coords
    descr: Array  # (N, D) float32 descriptors
    score: Array  # (N,) float32 detection scores
    track_id: Array  # (N,) int32 stable identity across epochs (-1 invalid)
    mask: Array  # (N,) bool validity

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    @property
    def num_valid(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @classmethod
    def empty(cls, capacity: int, descr_dim: int = 256) -> "FeatureSet":
        return cls(
            xy=jnp.zeros((capacity, 2), jnp.float32),
            descr=jnp.zeros((capacity, descr_dim), jnp.float32),
            score=jnp.zeros((capacity,), jnp.float32),
            track_id=-jnp.ones((capacity,), jnp.int32),
            mask=jnp.zeros((capacity,), bool),
        )

    @classmethod
    def from_arrays(
        cls,
        xy: np.ndarray,
        descr: np.ndarray | None = None,
        score: np.ndarray | None = None,
        track_id: np.ndarray | None = None,
        capacity: int | None = None,
        descr_dim: int = 256,
    ) -> "FeatureSet":
        """Pad host arrays up to `capacity` (default: next power of two)."""
        xy = np.asarray(xy, np.float32).reshape(-1, 2)
        n = xy.shape[0]
        if descr is not None:
            descr = np.asarray(descr, np.float32)
            if descr.shape[0] != n:  # reference stores D x N; accept both
                descr = descr.T
            descr_dim = descr.shape[1]
        if capacity is None:
            capacity = max(8, 1 << (max(n, 1) - 1).bit_length())
        if n > capacity:
            # JAX silently drops out-of-bounds scatter updates — without
            # this check, features would vanish without a trace
            raise ValueError(
                f"{n} features exceed FeatureSet capacity {capacity}")
        out = cls.empty(capacity, descr_dim)
        idx = jnp.arange(n)
        out = out.replace(
            xy=out.xy.at[idx].set(jnp.asarray(xy)),
            mask=out.mask.at[idx].set(True),
        )
        if descr is not None:
            out = out.replace(descr=out.descr.at[idx].set(jnp.asarray(descr)))
        if score is not None:
            out = out.replace(
                score=out.score.at[idx].set(
                    jnp.asarray(np.asarray(score, np.float32).reshape(-1))
                )
            )
        if track_id is not None:
            out = out.replace(
                track_id=out.track_id.at[idx].set(
                    jnp.asarray(np.asarray(track_id, np.int32).reshape(-1))
                )
            )
        else:
            out = out.replace(
                track_id=out.track_id.at[idx].set(jnp.arange(n, dtype=jnp.int32))
            )
        return out

    def compact(self) -> "Features":
        """Host-side: drop padding, return a growable Features."""
        m = np.asarray(self.mask)
        return Features.from_numpy(
            np.asarray(self.xy)[m],
            descr=np.asarray(self.descr)[m],
            scores=np.asarray(self.score)[m],
            track_ids=np.asarray(self.track_id)[m],
        )


class Features:
    """Host-side feature store with the reference's API surface.

    Internally numpy struct-of-arrays keyed by position; track_ids are
    the stable identities (ref core/features.py: dict track_id->Feature).
    """

    def __init__(self, descr_dim: int = 256):
        self._xy = np.zeros((0, 2), np.float32)
        self._descr = np.zeros((0, descr_dim), np.float32)
        self._score = np.zeros((0,), np.float32)
        self._track_id = np.zeros((0,), np.int32)
        self._last_track_id = -1

    def __len__(self) -> int:
        return self._xy.shape[0]

    def __repr__(self) -> str:
        return f"Features({len(self)} features, descr_dim={self._descr.shape[1]})"

    @property
    def last_track_id(self) -> int:
        return self._last_track_id

    @property
    def descr_dim(self) -> int:
        return self._descr.shape[1]

    def set_last_track_id(self, tid: int) -> None:
        self._last_track_id = int(tid)

    @classmethod
    def from_numpy(cls, xy, descr=None, scores=None, track_ids=None) -> "Features":
        f = cls(descr_dim=descr.shape[1] if descr is not None else 256)
        f.append_features_from_numpy(xy, descr=descr, scores=scores,
                                     track_ids=track_ids)
        return f

    def append_features_from_numpy(
        self, xy, descr=None, scores=None, track_ids=None
    ) -> None:
        """Append features; colliding/absent track ids are re-assigned
        progressively (ref core/features.py:417-425)."""
        xy = np.asarray(xy, np.float32).reshape(-1, 2)
        n = xy.shape[0]
        if descr is not None:
            descr = np.asarray(descr, np.float32)
            if descr.shape[0] != n and descr.shape[1] == n:
                descr = descr.T  # accept reference's (D, N) layout
        else:
            descr = np.zeros((n, self._descr.shape[1]), np.float32)
        if scores is None:
            scores = np.zeros((n,), np.float32)
        scores = np.asarray(scores, np.float32).reshape(-1)

        if track_ids is None:
            track_ids = np.arange(
                self._last_track_id + 1, self._last_track_id + 1 + n, dtype=np.int32
            )
        else:
            track_ids = np.asarray(track_ids, np.int32).reshape(-1)
            existing = set(self._track_id.tolist())
            if len(set(track_ids.tolist())) != n or existing & set(track_ids.tolist()):
                track_ids = np.arange(
                    self._last_track_id + 1,
                    self._last_track_id + 1 + n,
                    dtype=np.int32,
                )
        if descr.shape[1] != self._descr.shape[1]:
            if len(self) == 0:
                self._descr = np.zeros((0, descr.shape[1]), np.float32)
            else:
                raise ValueError("descriptor dim mismatch")
        self._xy = np.concatenate([self._xy, xy])
        self._descr = np.concatenate([self._descr, descr])
        self._score = np.concatenate([self._score, scores])
        self._track_id = np.concatenate([self._track_id, track_ids])
        if n:
            self._last_track_id = int(max(self._last_track_id, track_ids.max()))

    # -- exports (reference names) ----------------------------------------
    def to_numpy(self) -> dict:
        return {
            "kpts": self._xy.copy(),
            "descr": self._descr.copy(),
            "scores": self._score.copy(),
            "track_ids": self._track_id.copy(),
        }

    def kpts_to_numpy(self) -> np.ndarray:
        return self._xy.copy()

    def descr_to_numpy(self) -> np.ndarray:
        return self._descr.copy()

    def scores_to_numpy(self) -> np.ndarray:
        return self._score.copy()

    def track_ids_to_numpy(self) -> np.ndarray:
        return self._track_id.copy()

    def get_track_ids(self) -> tuple:
        return tuple(self._track_id.tolist())

    def get_features_as_dict(self) -> dict:
        """SuperPoint-style keys (ref core/features.py:~500)."""
        return {
            "keypoints0": self._xy.copy(),
            "descriptors0": self._descr.T.copy(),
            "scores0": self._score.copy(),
        }

    # -- filtering ----------------------------------------------------------
    def filter_feature_by_mask(self, inlier_mask, verbose: bool = False) -> None:
        m = np.asarray(inlier_mask, bool).reshape(-1)
        self._xy = self._xy[m]
        self._descr = self._descr[m]
        self._score = self._score[m]
        self._track_id = self._track_id[m]

    def filter_feature_by_index(self, indexes) -> None:
        idx = np.asarray(indexes, np.int64).reshape(-1)
        self._xy = self._xy[idx]
        self._descr = self._descr[idx]
        self._score = self._score[idx]
        self._track_id = self._track_id[idx]

    def get_feature_by_track_id(self, tid: int):
        pos = np.nonzero(self._track_id == tid)[0]
        if len(pos) == 0:
            return None
        i = pos[0]
        return {
            "x": float(self._xy[i, 0]),
            "y": float(self._xy[i, 1]),
            "track_id": int(tid),
            "descr": self._descr[i],
            "score": float(self._score[i]),
        }

    # -- device conversion ---------------------------------------------------
    def to_padded(self, capacity: int | None = None) -> FeatureSet:
        return FeatureSet.from_arrays(
            self._xy,
            descr=self._descr,
            score=self._score,
            track_id=self._track_id,
            capacity=capacity,
            descr_dim=self._descr.shape[1],
        )

    # -- persistence -----------------------------------------------------------
    def save_as_txt(self, path, fmt: str = "%i", delimiter: str = ",",
                    header: str = "x,y") -> None:
        np.savetxt(path, self._xy, fmt=fmt, delimiter=delimiter,
                   header=header, comments="")

    def save_as_pickle(self, path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def read_pickle(path) -> "Features":
        with open(path, "rb") as f:
            return pickle.load(f)
