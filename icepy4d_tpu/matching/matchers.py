"""Image matchers: SuperPoint extraction + LightGlue / SuperGlue matching.

TPU-first redesign of the reference matching engine
(matching/matchers.py:68-1342). Key differences from the reference:

- Tiles are a statically-shaped device batch: SuperPoint runs ONCE over
  every tile of both images (one fused forward), instead of the
  reference's sequential per-tile-pair python loop (matchers.py:367-425).
- Tile-pair matching is a single vmapped matcher forward over the selected
  pair batch (padded to a power-of-two bucket to keep jit caches small).
- All keypoint sets are fixed-capacity padded arrays with validity masks
  (no dynamic shapes anywhere under jit).
- Geometric verification is hypothesis-parallel on-device RANSAC
  (ops/ransac.py) instead of pydegensac's sequential C++ loop.

Host work is limited to image decode, tile-pair selection bookkeeping and
final assembly of the (small) match list.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from itertools import product
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.matching.enums import (
    GeometricVerification,
    Quality,
    QUALITY_NAMES,
    QUALITY_SCALE,
    TileSelection,
)
from icepy4d_tpu.matching.geometric_verification import geometric_verification
from icepy4d_tpu.matching.tiling import Tiler
from icepy4d_tpu.models.superpoint import SuperPoint
from icepy4d_tpu.models.lightglue import LightGlue
from icepy4d_tpu.models.superglue import SuperGlue
from icepy4d_tpu.ops.image import (extract_tiles, quality_resize,
                                   rgb_to_gray)
from icepy4d_tpu.ops.topk import top2_last

logger = logging.getLogger("icepy4d_tpu")


def _force_random_weights(opt: dict) -> bool:
    """True when a weight-less matcher must use random init instead of
    the bundled self-trained checkpoints: opt random_weights=True, or
    env ICEPY4D_RANDOM_WEIGHTS=1 (set by tests/conftest.py — the
    synthetic numerics gates are built around deterministic random
    weights)."""
    import os

    return bool(opt.get("random_weights")) or \
        os.environ.get("ICEPY4D_RANDOM_WEIGHTS", "") not in ("", "0")

MIN_MATCHES_PER_TILE = 5


class _LazyHostArray:
    """Matched-descriptor block that stays ON DEVICE until first host
    access.

    Downloading the matched descriptors measured as the single largest
    cost of a warm full-res match over the remote-TPU link, yet only
    the tracking path ever reads them — geometry-only consumers (GV ->
    orientation -> BA) now never pay the transfer. Row selections
    (inlier masks, dedup indices) compose lazily and apply after the
    one deferred download.

    Device layout is (N, D) rows; `.get()` returns the reference's
    column-major (D, N) float32 (ref matchers.py:44-48).
    """

    def __init__(self, dev, n_rows: int):
        self._dev = dev
        self._sels: list = [slice(0, int(n_rows))]
        self._np: np.ndarray | None = None

    def select(self, sel) -> None:
        """Append a row selection (mask or index array)."""
        if self._np is not None:
            self._np = self._np[:, sel]
        else:
            self._sels.append(sel)

    def get(self) -> np.ndarray:
        if self._np is None:
            a = np.asarray(self._dev).astype(np.float32)
            for s in self._sels:
                a = a[s]
            self._np = np.ascontiguousarray(a.T)
            self._dev = None
            self._sels = []
        return self._np

    def __array__(self, dtype=None):
        a = self.get()
        return a if dtype is None else a.astype(dtype)

    def __getitem__(self, item):
        return self.get()[item]

    @property
    def shape(self) -> tuple:
        if self._np is not None:
            return self._np.shape
        # pending selections make the final row count unknowable
        # without materializing — do so (shape readers want the truth)
        return self.get().shape


@dataclass
class FeaturesBase:
    """Matcher-internal feature bundle (ref matchers.py:44-48).

    keypoints (N, 2) float32 [x, y]; descriptors (D, N) — the reference's
    column-major layout is kept for API parity; scores (N,).
    """

    keypoints: np.ndarray
    descriptors: np.ndarray = None
    scores: np.ndarray = None


def _round_up_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _host_gray(im):
    """Grayscale on host before upload: RGB uint8 would cost 3x the
    host->device bytes (the bottleneck on remote links). Shared by the
    pair match and the seeded-tracking extraction so both produce
    bit-identical preprocessed frames (tracking reuses the match's
    cached features)."""
    if isinstance(im, np.ndarray) and im.ndim == 3 \
            and im.dtype == np.uint8:
        import cv2

        return cv2.cvtColor(im, cv2.COLOR_RGB2GRAY)
    return im


@partial(jax.jit, static_argnames=("quality",))
def _preprocess(image: jnp.ndarray, quality: str) -> jnp.ndarray:
    """uint8/float (H, W[, 3]) -> grayscale [0,1] at the quality scale.

    One fused XLA program: running grayscale + pyramid eagerly costs one
    compile per conv op, which is expensive over remote-TPU tunnels.
    """
    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img / 255.0
    if img.ndim == 3:
        img = rgb_to_gray(img)
    return quality_resize(img, quality)


@partial(jax.jit, static_argnames=("n",))
def _downsample(img: jnp.ndarray, n: int) -> jnp.ndarray:
    for _ in range(n):
        img = quality_resize(img, "medium")
    return img


class ImageMatcherBase:
    """Template-method matcher (API parity: ref matchers.py:68-824).

    match(image0, image1, quality, tile_selection, **config) resizes by
    Quality, extracts+matches (full-frame or tiled), rescales keypoints to
    original pixels, geometric-verifies, and exposes results via the
    mkpts0/1, descriptors0/1, scores0/1, mconf properties.
    """

    def __init__(self, opt: dict | None = None) -> None:
        opt = dict(opt or {})
        self._opt = opt
        self._max_keypoints = int(opt.get("max_keypoints", -1))
        if self._max_keypoints <= 0:
            self._max_keypoints = 4096
        self._reset()
        self._sp_cache: dict[tuple, SuperPoint] = {}
        # pow2 tile-pair bucket of the last match: the seeded tracking
        # path pads its tile-diagonal batch to this so the fused
        # gather+match program is a compile-cache hit (tracking.py)
        self._pair_bucket = 0
        # device-side features of the last top-level match's two images
        # (keyed by input-object ids + tile signature): the pipeline
        # runs seeded tracking on the SAME images right after the pair
        # match — re-extracting them cost a full extractor forward per
        # epoch (tracking.py::_extract_new reads this)
        self._feat_cache: dict | None = None
        self._cache_armed = False
        self._build_models(opt)

    # matchers hash/eq BY CONFIG (same recipe as the models): methods
    # jitted with a static `self` then share one compiled program across
    # re-instantiations — through a remote-TPU tunnel a recompile costs
    # minutes, so e.g. the pipeline's recovery rematch (a fresh matcher
    # with relaxed opts) must not recompile the identically-configured
    # production forward
    def _config_key(self) -> tuple:
        def canon(v):
            if isinstance(v, dict):
                return tuple(sorted((k, canon(x)) for k, x in v.items()))
            if isinstance(v, (list, tuple)):
                return tuple(canon(x) for x in v)
            try:
                hash(v)
                return v
            except TypeError:  # arrays/params: identity is the best key
                return (type(v).__name__, id(v))

        return (type(self), canon(self._opt))

    def __hash__(self) -> int:
        return hash(self._config_key())

    def __eq__(self, other) -> bool:
        return isinstance(other, ImageMatcherBase) \
            and self._config_key() == other._config_key()

    # -- subclass hooks ------------------------------------------------------

    def _build_models(self, opt: dict) -> None:
        raise NotImplementedError

    def _matcher_data_extra(self, feats, idx, size):
        """Extra per-side data entries (e.g. SuperGlue needs scores)."""
        return {}

    def _init_sp_params(self, opt: dict, rng):
        if "superpoint_params" in opt:
            return opt["superpoint_params"]
        if "superpoint_weights" in opt:
            path = str(opt["superpoint_weights"])
            if path.endswith(".npz"):
                # self-trained checkpoint (scripts/train_superpoint.py)
                from icepy4d_tpu.models.convert import load_params

                return jax.tree.map(jnp.asarray, load_params(path))
            from icepy4d_tpu.models.convert import load_torch_superpoint

            return load_torch_superpoint(path)
        kind = str(opt.get("extractor", "superpoint")).lower()
        if kind in ("superpoint", "aliked") and not _force_random_weights(opt):
            # default deployment path: the committed self-trained
            # checkpoint (the official one is not downloadable offline)
            from icepy4d_tpu.models.convert import (bundled_checkpoint,
                                                    load_params)

            path = bundled_checkpoint(
                {"superpoint": "superpoint_synthetic.npz",
                 "aliked": "aliked_synthetic.npz"}[kind])
            if path is not None:
                logger.info(
                    "%s: bundled self-trained checkpoint %s", kind, path)
                self._sp_bundled = True
                return jax.tree.map(jnp.asarray, load_params(path))
        logger.warning("SuperPoint: no checkpoint given — random weights")
        return self._superpoint(self._max_keypoints).init(rng)

    def _run_matcher(self, data: dict) -> dict:
        raise NotImplementedError

    # -- public results ------------------------------------------------------

    def _reset(self) -> None:
        d = self.descriptor_dim
        self._mkpts0 = np.empty((0, 2), np.float32)
        self._mkpts1 = np.empty((0, 2), np.float32)
        self._descriptors0 = np.empty((d, 0), np.float32)
        self._descriptors1 = np.empty((d, 0), np.float32)
        self._scores0 = np.empty((0,), np.float32)
        self._scores1 = np.empty((0,), np.float32)
        self._mconf = np.empty((0,), np.float32)
        self._F = None
        self._inlier_mask = None

    @property
    def mkpts0(self) -> np.ndarray:
        return self._mkpts0

    @property
    def mkpts1(self) -> np.ndarray:
        return self._mkpts1

    @property
    def descriptors0(self) -> np.ndarray:
        if isinstance(self._descriptors0, _LazyHostArray):
            self._descriptors0 = self._descriptors0.get()
        return self._descriptors0

    @property
    def descriptors1(self) -> np.ndarray:
        if isinstance(self._descriptors1, _LazyHostArray):
            self._descriptors1 = self._descriptors1.get()
        return self._descriptors1

    @property
    def scores0(self) -> np.ndarray:
        return self._scores0

    @property
    def scores1(self) -> np.ndarray:
        return self._scores1

    @property
    def mconf(self) -> np.ndarray:
        return self._mconf

    @property
    def F(self):
        return self._F

    @property
    def inlier_mask(self):
        return self._inlier_mask

    # -- building blocks -----------------------------------------------------

    def _superpoint(self, max_keypoints: int):
        """Local-feature extractor (SuperPoint default; opt
        extractor='disk' swaps in the 128-d DISK U-Net, 'sift' the
        parameter-free TPU-native SIFT — the offline wide-baseline
        workhorse, models/sift.py)."""
        kind = str(self._opt.get("extractor", "superpoint")).lower()
        if kind == "sift":
            from icepy4d_tpu.models.sift import SIFT

            key = (
                kind,
                max_keypoints,
                float(self._opt.get("contrast_threshold", 0.015)),
                float(self._opt.get("edge_threshold", 12.0)),
                bool(self._opt.get("upsample", True)),
                bool(self._opt.get("dual_orientation", True)),
            )
            if key not in self._sp_cache:
                self._sp_cache[key] = SIFT(
                    max_keypoints=key[1],
                    contrast_threshold=key[2],
                    edge_threshold=key[3],
                    upsample=key[4],
                    dual_orientation=key[5],
                )
            return self._sp_cache[key]
        key = (
            kind,
            max_keypoints,
            float(self._opt.get("keypoint_threshold", 0.0005)),
            int(self._opt.get("nms_radius", 4)),
            str(self._opt.get("precision", "default")),
            str(self._opt.get("activation_dtype", "float32")),
        )
        if key not in self._sp_cache:
            if kind == "disk":
                from icepy4d_tpu.models.disk import DISK

                self._sp_cache[key] = DISK(
                    max_keypoints=key[1],
                    detection_threshold=key[2],
                    nms_radius=max(key[3] // 2, 2),
                )
            elif kind == "aliked":
                from icepy4d_tpu.models.aliked import ALIKED

                self._sp_cache[key] = ALIKED(
                    max_keypoints=key[1],
                    detection_threshold=key[2],
                    nms_radius=max(key[3] // 2, 2),
                    precision=key[4],
                    dtype=jnp.dtype(key[5]),
                )
            else:
                import jax.numpy as _jnp

                self._sp_cache[key] = SuperPoint(
                    max_keypoints=key[1],
                    detection_threshold=key[2],
                    nms_radius=key[3],
                    precision=key[4],
                    dtype=_jnp.dtype(key[5]),
                )
        return self._sp_cache[key]

    @property
    def descriptor_dim(self) -> int:
        kind = str(self._opt.get("extractor", "superpoint")).lower()
        return 128 if kind in ("disk", "sift", "aliked") else 256

    @staticmethod
    def _to_gray_device(image: np.ndarray) -> jnp.ndarray:
        img = jnp.asarray(image)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        else:
            img = img.astype(jnp.float32)
        if img.ndim == 3:
            img = rgb_to_gray(img)
        return img

    @staticmethod
    def _auto_chunk(n: int, bytes_per_item: float,
                    budget: float = 2 << 30, cap: int = 32) -> int:
        """Largest divisor of n whose chunk fits the activation budget."""
        c = max(1, min(cap, n, int(budget // max(bytes_per_item, 1.0))))
        while n % c:
            c -= 1
        return c

    def _extract(self, tiles: jnp.ndarray, max_keypoints: int) -> dict:
        """SuperPoint over a (T, h, w) tile batch -> padded feature dict.

        Chunked over T so the trunk's activations never exceed the HBM
        budget; chunk sizes divide T, so one compiled shape serves every
        chunk. Peak live state per tile is the conv1b in+out pair in
        space-to-depth layout: 2 x (h/2 * w/2 * 256) activations =
        h*w*128 elements. Every extra chunk costs a full remote-TPU
        dispatch round trip (~0.3-1 s through the tunnel), so the
        budget is sized to what a 16-GB chip demonstrably fits (a
        24-MP f32 frame = 12.3 GB peak compiles and runs).
        """
        sp = self._superpoint(max_keypoints)
        t, h, w = tiles.shape[:3]
        chunk = self._extract_chunk(t, h, w)
        if chunk == t:
            return sp.extract(self._sp_params, tiles)
        outs = [sp.extract(self._sp_params, tiles[i:i + chunk])
                for i in range(0, t, chunk)]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)

    def _extract_chunk(self, t: int, h: int, w: int) -> int:
        act_bytes = 2 if str(self._opt.get(
            "activation_dtype", "float32")) == "bfloat16" else 4
        return self._auto_chunk(t, h * w * 128 * act_bytes,
                                budget=13 << 30)

    def _store_feat_cache(self, sig: tuple, feats0: dict,
                          feats1: dict) -> None:
        """Publish the top-level match's per-image device features for
        the seeded-tracking path (keyed by the ORIGINAL image-object
        ids, which `match()` recorded; the held refs keep those ids
        from being recycled). Armed only for the outer match — nested
        low-res preselection matches must not poison the cache."""
        if not self._cache_armed:
            return
        self._cache_armed = False
        self._feat_cache = {
            "sig": sig,
            "ids": self._match_input_ids,
            "refs": self._match_input_refs,
            "feats": (feats0, feats1),
        }

    @partial(jax.jit, static_argnames=("self", "sp", "th", "tw"))
    def _gather_extract(self, sp, g, origins, th: int, tw: int) -> dict:
        """Fused tile gather + extractor forward: ONE dispatch instead
        of gather-dispatch + extract-dispatch (each remote round trip
        costs ~0.15-0.5 s through the tunnel — they rivaled the actual
        device compute in the warm full-res profile)."""
        tiles = extract_tiles(g, origins, th, tw)
        return sp.extract(self._sp_params, tiles)

    def _extract_tiled(self, g: jnp.ndarray, origins: np.ndarray,
                       th: int, tw: int, max_keypoints: int) -> dict:
        """Extract features for all tiles of a (scaled) image with the
        gather fused into the trunk dispatch, chunked to the HBM
        activation budget (see _extract)."""
        sp = self._superpoint(max_keypoints)
        t = len(origins)
        dev_origins = jnp.asarray(np.asarray(origins, np.int32))
        chunk = self._extract_chunk(t, th, tw)
        if chunk == t:
            return self._gather_extract(sp, g, dev_origins, th, tw)
        outs = [self._gather_extract(sp, g, dev_origins[i:i + chunk],
                                     th, tw)
                for i in range(0, t, chunk)]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)

    def _match_pair_batch(
        self,
        feats0: dict,
        feats1: dict,
        idx0: np.ndarray,
        idx1: np.ndarray,
        pair_valid: np.ndarray,
        size0: tuple[int, int],
        size1: tuple[int, int],
    ) -> dict:
        """Vmapped matcher forward over a padded batch of tile pairs.

        feats*: SuperPoint outputs over the tile batches (T*, K, ...).
        idx0/idx1 (P,): tile indices per pair; pair_valid (P,) masks
        bucket padding. size* = (w, h) of one tile.
        """
        # chunk the pair batch so the (K+1)^2 assignment matrices stay
        # inside the activation budget; bucket sizes are powers of two,
        # so a power-of-two chunk always divides evenly. Budget sized so
        # the headline 16-pair x 4096-kpt batch is ONE dispatch (1.07 GB
        # of assignment matrices — measured to fit with room): every
        # extra chunk pays a remote-dispatch round trip.
        p = len(idx0)
        k = int(feats0["keypoints"].shape[1])
        chunk = self._auto_chunk(p, (k + 1) ** 2 * 4 * 4, budget=6 << 30)
        i0 = jnp.asarray(idx0)
        i1 = jnp.asarray(idx1)
        pv = jnp.asarray(pair_valid)
        run = self._gather_and_match if self._fusable_forward() \
            else self._gather_and_match_eager
        if chunk == p:
            return run(feats0, feats1, i0, i1, pv, size0, size1)
        outs = [
            run(feats0, feats1, i0[i:i + chunk], i1[i:i + chunk],
                pv[i:i + chunk], size0, size1)
            for i in range(0, p, chunk)
        ]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)

    def _fusable_forward(self) -> bool:
        """Whether _run_matcher is pure device code that may be traced
        inside one fused jit (overridden False by forwards with
        data-dependent HOST control flow, e.g. adaptive LightGlue)."""
        return True

    @partial(jax.jit, static_argnames=("self", "size0", "size1"))
    def _gather_and_match(self, feats0, feats1, idx0, idx1, pair_valid,
                          size0, size1) -> dict:
        """Per-pair feature gather fused into the matcher forward: the
        gathers were ~10 eager device ops = ~10 remote round trips per
        match (the matcher hashes by config, so this program survives
        re-instantiation)."""
        return self._gather_and_match_eager(
            feats0, feats1, idx0, idx1, pair_valid, size0, size1)

    def _gather_and_match_eager(self, feats0, feats1, idx0, idx1,
                                pair_valid, size0, size1) -> dict:
        pv = pair_valid[:, None]
        p = idx0.shape[0]
        data = {
            "kpts0": feats0["keypoints"][idx0],
            "desc0": feats0["descriptors"][idx0],
            "mask0": feats0["mask"][idx0] & pv,
            "size0": jnp.broadcast_to(
                jnp.asarray(size0, jnp.float32), (p, 2)),
            "kpts1": feats1["keypoints"][idx1],
            "desc1": feats1["descriptors"][idx1],
            "mask1": feats1["mask"][idx1] & pv,
            "size1": jnp.broadcast_to(
                jnp.asarray(size1, jnp.float32), (p, 2)),
        }
        data.update(self._matcher_data_extra(feats0, idx0, 0))
        data.update(self._matcher_data_extra(feats1, idx1, 1))
        return self._run_matcher(data)

    @staticmethod
    @partial(jax.jit, static_argnames=("cap", "n_out"))
    def _compact_on_device(
        feats0: dict,
        feats1: dict,
        out: dict,
        idx0,
        idx1,
        origins0,
        origins1,
        cap: int,
        n_out: int,
    ):
        """Gather the top-`cap` matches per pair AND flat-pack the
        valid rows across pairs into (n_out, ...) ON DEVICE.

        Only matched rows cross the host boundary: transferring even
        the per-pair-capped (P, C, 256) descriptor blocks measured
        7-14 s of the warm full-res headline on the 50 MB/s remote-TPU
        link (most rows invalid); the packed (n_out, 256) form is the
        minimal pow2 bucket over the true match count. `n_out` is
        host-computed from the per-pair counts (pow2-bucketed so one
        compiled shape serves a season).
        """
        m0 = out["matches0"]                      # (P, K)
        conf = out["mscores0"]
        valid = m0 > -1
        score = jnp.where(valid, conf, -1.0)
        topv, topi = jax.lax.top_k(score, cap)    # (P, C)
        sel = topv > -0.5
        j = jnp.take_along_axis(jnp.maximum(m0, 0), topi, 1)

        def side(feats, idx, org, pick):
            k = feats["keypoints"][idx]
            d = feats["descriptors"][idx]
            s = feats["scores"][idx]
            mk = jnp.take_along_axis(k, pick[..., None], 1) \
                + org[idx][:, None, :]
            return (mk,
                    jnp.take_along_axis(d, pick[..., None], 1),
                    jnp.take_along_axis(s, pick, 1))

        mk0, d0, s0 = side(feats0, idx0, origins0, topi)
        mk1, d1, s1 = side(feats1, idx1, origins1, j)

        # valid-first flat packing (stable argsort keeps the original
        # (pair, rank) order of the surviving rows); descriptors cross
        # the link as float16 — half the bytes of the dominant transfer,
        # ~1e-3 relative rounding on unit-norm descriptors (far below
        # any NN match decision margin)
        order = jnp.argsort(~sel.reshape(-1))[:n_out]
        pick = lambda a: a.reshape((-1,) + a.shape[2:])[order]
        return (pick(mk0), pick(mk1),
                pick(d0).astype(jnp.float16),
                pick(d1).astype(jnp.float16),
                pick(s0), pick(s1), pick(topv))

    def _assemble(
        self,
        feats0: dict,
        feats1: dict,
        out: dict,
        idx0: np.ndarray,
        idx1: np.ndarray,
        origins0: np.ndarray,
        origins1: np.ndarray,
    ):
        """Batched match result -> host matched arrays (valid rows only).

        The compaction cap adapts to the ACTUAL max match count per pair
        (rounded onto the pow4 ladder, so jit caches stay small AND
        stable across a season's varying counts) — with few matches
        almost nothing crosses the host link."""
        from icepy4d_tpu.ops.buckets import pad_bucket

        k = int(out["matches0"].shape[1])
        # tiny transfer first: how many matches per pair?
        counts = np.asarray(jnp.sum(out["matches0"] > -1, axis=1))
        cap = min(k, int(self._opt.get("max_matches_per_pair", 4096)),
                  pad_bucket(max(int(counts.max(initial=0)), 1)))
        # rows surviving the per-pair cap — the exact final count, so
        # the packed transfer is the minimal pow4 bucket over it
        total = int(np.minimum(counts, cap).sum())
        n_out = min(pad_bucket(max(total, 1)),
                    len(counts) * cap)
        arrs = self._compact_on_device(
            feats0, feats1, out,
            jnp.asarray(idx0), jnp.asarray(idx1),
            jnp.asarray(origins0, jnp.float32),
            jnp.asarray(origins1, jnp.float32), cap, n_out)
        mk0d, mk1d, d0, d1, s0d, s1d, confd = arrs
        # start the host copies of the SMALL arrays before blocking on
        # any (serial np.asarray pays one link round trip per array);
        # descriptors stay on device — only the tracking path reads
        # them, and their download dominated the warm full-res match
        small = (mk0d, mk1d, s0d, s1d, confd)
        for a in small:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        mk0, mk1, s0, s1, conf = (np.asarray(a)[:total] for a in small)
        return (mk0, mk1, _LazyHostArray(d0, total),
                _LazyHostArray(d1, total), s0, s1, conf)

    @staticmethod
    def _dedup(mk0, mk1, d0, d1, s0, s1, conf):
        """Unique features on image0 (ref matchers.py:444-450)."""
        mk0, uniq = np.unique(mk0, axis=0, return_index=True)

        def rows(d):
            if isinstance(d, _LazyHostArray):
                d.select(uniq)
                return d
            return d[uniq]

        return (mk0, mk1[uniq], rows(d0), rows(d1), s0[uniq], s1[uniq],
                conf[uniq])

    # -- tile selection --------------------------------------------------------

    def _select_tile_pairs(
        self,
        img0: jnp.ndarray,
        img1: jnp.ndarray,
        tiler0: Tiler,
        tiler1: Tiler,
        method: TileSelection,
        min_matches_per_tile: int,
    ) -> list[tuple[int, int]]:
        t0 = list(tiler0.limits.keys())
        t1 = list(tiler1.limits.keys())
        if method is TileSelection.EXHAUSTIVE:
            return sorted(product(t0, t1))
        if method is TileSelection.GRID:
            return sorted(zip(t0, t1))
        if method is not TileSelection.PRESELECTION:
            raise ValueError(f"unsupported tile selection {method}")

        # PRESELECTION (ref matchers.py:513-560): match heavily-downsampled
        # full frames, vote tile pairs containing enough coarse matches.
        h = int(img0.shape[0])
        if h > 8000:
            n_down = 4
        elif h > 4000:
            n_down = 3
        elif h > 2000:
            n_down = 2
        else:
            n_down = 1
        lo0 = _downsample(img0, n_down)
        lo1 = _downsample(img1, n_down)
        # the nested low-res match must not publish its features as the
        # top-level images' extraction cache
        armed, self._cache_armed = self._cache_armed, False
        mk0, mk1, *_ = self._match_full(lo0, lo1, max_keypoints=4096)
        self._cache_armed = armed
        scale = float(2 ** n_down)
        mk0 = mk0 * scale
        mk1 = mk1 * scale

        pairs = []
        for i, j in sorted(product(t0, t1)):
            l0 = tiler0.limits[i]
            l1 = tiler1.limits[j]
            in0 = (
                (mk0[:, 0] > l0[0]) & (mk0[:, 0] < l0[2])
                & (mk0[:, 1] > l0[1]) & (mk0[:, 1] < l0[3])
            )
            in1 = (
                (mk1[:, 0] > l1[0]) & (mk1[:, 0] < l1[2])
                & (mk1[:, 1] > l1[1]) & (mk1[:, 1] < l1[3])
            )
            if int((in0 & in1).sum()) > min_matches_per_tile:
                pairs.append((i, j))
        logger.info("Preselection kept %d tile pairs", len(pairs))
        return pairs

    # -- matching paths --------------------------------------------------------

    def _match_full(self, img0, img1, max_keypoints: int | None = None):
        """Single full-frame pair match -> host matched arrays.

        No pre-padding: SuperPoint.extract pads internally AND masks its
        own pad band as border (pre-padded input would shift the band
        inside and let edge detections through)."""
        k = max_keypoints or self._max_keypoints
        p0, p1 = img0, img1
        if p0.shape == p1.shape:
            feats = self._extract(jnp.stack([p0, p1]), k)
            feats0 = jax.tree.map(lambda a: a[:1], feats)
            feats1 = jax.tree.map(lambda a: a[1:], feats)
        else:
            feats0 = self._extract(p0[None], k)
            feats1 = self._extract(p1[None], k)
        self._store_feat_cache(
            (1, int(img0.shape[0]), int(img0.shape[1]), k),
            feats0, feats1)
        size0 = (int(img0.shape[1]), int(img0.shape[0]))
        size1 = (int(img1.shape[1]), int(img1.shape[0]))
        idx = np.zeros(1, np.int32)
        self._pair_bucket = 1
        out = self._match_pair_batch(
            feats0, feats1, idx, idx, np.ones(1, bool), size0, size1)
        zero = np.zeros((1, 2), np.float32)
        return self._assemble(feats0, feats1, out, idx, idx, zero, zero)

    def _empty_result(self):
        z2 = np.empty((0, 2), np.float32)
        zd = np.empty((0, self.descriptor_dim), np.float32)
        z = np.empty((0,), np.float32)
        return z2, z2, zd, zd, z, z, z

    def _prepare_tile_pairs(
        self,
        img0,
        img1,
        tile_selection: TileSelection,
        grid,
        overlap: int,
        origin,
        min_matches_per_tile: int,
    ):
        """Shared tiled-matching prologue: tilers, pair selection, pow2
        pair bucket. Returns (tiler0, tiler1, idx0, idx1, pair_valid)
        or None when no pairs survive selection."""
        tiler0 = Tiler(grid=grid, overlap=overlap, origin=origin)
        tiler1 = Tiler(grid=grid, overlap=overlap, origin=origin)
        tiler0.compute_limits_by_grid(np.empty(img0.shape[:2]))
        tiler1.compute_limits_by_grid(np.empty(img1.shape[:2]))
        self._tiler = tiler0

        pairs = self._select_tile_pairs(
            img0, img1, tiler0, tiler1, tile_selection, min_matches_per_tile)
        if hasattr(self, "timer"):
            self.timer.update("preselection")
        if not pairs:
            logger.warning("No tile pairs selected — no matches")
            return None

        # pad the pair list to a power-of-two bucket: stable jit shapes
        p = len(pairs)
        bucket = _round_up_pow2(p)
        idx0 = np.zeros(bucket, np.int32)
        idx1 = np.zeros(bucket, np.int32)
        idx0[:p] = [a for a, _ in pairs]
        idx1[:p] = [b for _, b in pairs]
        pair_valid = np.arange(bucket) < p
        self._pair_bucket = bucket
        return tiler0, tiler1, idx0, idx1, pair_valid

    def _match_tiled(
        self,
        img0,
        img1,
        tile_selection: TileSelection,
        grid,
        overlap: int,
        origin,
        min_matches_per_tile: int,
    ):
        prep = self._prepare_tile_pairs(
            img0, img1, tile_selection, grid, overlap, origin,
            min_matches_per_tile)
        if prep is None:
            return self._empty_result()
        tiler0, tiler1, idx0, idx1, pair_valid = prep

        th, tw = tiler0.tile_size
        # fused gather+extract, one dispatch per image (per HBM chunk):
        # per-image programs let the second image's host->device
        # transfer overlap the first image's extraction compute
        feats0 = self._extract_tiled(img0, tiler0.tile_origins(), th, tw,
                                     self._max_keypoints)
        feats1 = self._extract_tiled(img1, tiler1.tile_origins(), th, tw,
                                     self._max_keypoints)
        self._store_feat_cache(
            (tiler0.n_tiles, th, tw, self._max_keypoints), feats0, feats1)
        out = self._match_pair_batch(
            feats0, feats1, idx0, idx1, pair_valid, (tw, th), (tw, th))
        res = self._assemble(
            feats0, feats1, out, idx0, idx1,
            tiler0.tile_origins().astype(np.float32),
            tiler1.tile_origins().astype(np.float32),
        )
        return self._dedup(*res)

    # -- template method --------------------------------------------------------

    def match(
        self,
        image0: np.ndarray,
        image1: np.ndarray,
        quality: Quality = Quality.HIGH,
        tile_selection: TileSelection = TileSelection.NONE,
        **config,
    ) -> bool:
        """Match two images; results land in the mkpts0/1... properties.

        Mirrors the reference driver (matchers.py:139-261): quality
        resize -> (full | tiled) matching -> rescale keypoints ->
        geometric verification -> inlier filtering.
        """
        from icepy4d_tpu.utils.timer import AverageTimer

        self.timer = AverageTimer()
        self._reset()
        gv_method = config.get(
            "geometric_verification", GeometricVerification.PYDEGENSAC)
        threshold = config.get("threshold", 1.0)
        confidence = config.get("confidence", 0.9999)
        save_dir = config.get("save_dir", None)

        host_gray = _host_gray
        qname = QUALITY_NAMES[quality]
        self._cache_armed = True
        self._match_input_ids = (id(image0), id(image1))
        self._match_input_refs = (image0, image1)
        g0 = _preprocess(jnp.asarray(host_gray(image0)), qname)
        g1 = _preprocess(jnp.asarray(host_gray(image1)), qname)

        if tile_selection is TileSelection.NONE:
            res = self._match_full(g0, g1)
        else:
            res = self._match_tiled(
                g0, g1, tile_selection,
                grid=config.get("grid", [1, 1]),
                overlap=int(config.get("overlap", 0)),
                origin=config.get("origin", [0, 0]),
                min_matches_per_tile=int(
                    config.get("min_matches_per_tile", MIN_MATCHES_PER_TILE)),
            )
        mk0, mk1, d0, d1, s0, s1, conf = res

        # back to original-resolution pixel coordinates
        scale = QUALITY_SCALE[quality]
        if scale != 1.0:
            mk0 = mk0 / scale
            mk1 = mk1 / scale

        self._mkpts0 = np.asarray(mk0, np.float32)
        self._mkpts1 = np.asarray(mk1, np.float32)
        # lazy blocks defer their (dominant) download until someone
        # actually reads descriptors (the tracking path); plain arrays
        # land in the reference's (D, N) layout immediately
        self._descriptors0 = d0 if isinstance(d0, _LazyHostArray) \
            else np.asarray(d0, np.float32).T
        self._descriptors1 = d1 if isinstance(d1, _LazyHostArray) \
            else np.asarray(d1, np.float32).T
        self._scores0 = np.asarray(s0, np.float32)
        self._scores1 = np.asarray(s1, np.float32)
        self._mconf = np.asarray(conf, np.float32)
        logger.info("Found %d putative matches", len(self._mconf))
        self.timer.update("matching")

        if gv_method is not GeometricVerification.NONE:
            F, mask = geometric_verification(
                self._mkpts0, self._mkpts1, method=gv_method,
                threshold=threshold, confidence=confidence,
                scores=self._mconf,
            )
            self._F = F
            self._inlier_mask = mask
            self._filter_matches_by_mask(mask)
            self.timer.update("geometric_verification")

        if bool(config.get("do_viz_matches", False)) \
                and save_dir is not None:
            from icepy4d_tpu.visualization import plot_matches_cv2

            plot_matches_cv2(
                np.asarray(image0), np.asarray(image1),
                self._mkpts0, self._mkpts1,
                path=str(Path(save_dir) / "matches.png"))
        if save_dir is not None:
            self.save_mkpts_as_txt(save_dir)
        self.timer.print("Matching")
        return True

    def _filter_matches_by_mask(self, mask: np.ndarray) -> None:
        """Keep inliers only (ref matchers.py:682-700)."""
        self._mkpts0 = self._mkpts0[mask]
        self._mkpts1 = self._mkpts1[mask]
        for attr in ("_descriptors0", "_descriptors1"):
            d = getattr(self, attr)
            if isinstance(d, _LazyHostArray):
                d.select(mask)
            else:
                setattr(self, attr, d[:, mask])
        self._scores0 = self._scores0[mask]
        self._scores1 = self._scores1[mask]
        self._mconf = self._mconf[mask]

    def save_mkpts_as_txt(
        self, savedir, delimiter: str = ",", header: str = "x,y",
    ) -> None:
        """Save matched keypoints to text files (ref matchers.py:802-824)."""
        path = Path(savedir)
        path.mkdir(parents=True, exist_ok=True)
        for name, arr in (("keypoints_0.txt", self._mkpts0),
                          ("keypoints_1.txt", self._mkpts1)):
            np.savetxt(path / name, arr, fmt="%.2f", delimiter=delimiter,
                       newline="\n", header=header)


class LightGlueMatcher(ImageMatcherBase):
    """SuperPoint + LightGlue (ref matchers.py:1202-1342).

    opt keys: max_keypoints (default 4096), filter_threshold (0.1),
    n_layers (9), superpoint_weights / lightglue_weights (torch .pth
    or self-trained .npz paths), superpoint_params / matcher_params
    (ready JAX pytrees). With no weights given, the committed
    self-trained checkpoints (weights/*.npz) are the default;
    random_weights=True opts out (mainly for tests).

    opt adaptive=True enables the reference's adaptive depth/width
    (early exit + point pruning, ref lightglue.py:491-510) via the
    segment-jitted host loop (models/lightglue.py::match_adaptive);
    tune with depth_confidence (0.95) / width_confidence (0.99).
    Default off: the single fused static forward usually wins on a
    high-latency device link.
    """

    def _build_models(self, opt: dict) -> None:
        self._adaptive = bool(opt.get("adaptive", False))
        self._depth_confidence = float(opt.get("depth_confidence", 0.95))
        self._width_confidence = float(opt.get("width_confidence", 0.99))
        self.matcher = LightGlue(
            n_layers=int(opt.get("n_layers", 9)),
            filter_threshold=float(opt.get("filter_threshold", 0.1)),
            input_dim=self.descriptor_dim,
            # bf16 trunk halves the forward's activation HBM traffic;
            # measured 99.3% match agreement with the bundled trained
            # checkpoint (assignment head stays f32). Opt out with
            # {"activation_dtype": "float32"}.
            activation_dtype=str(opt.get("activation_dtype", "bfloat16")),
        )
        rng = jax.random.PRNGKey(int(opt.get("seed", 0)))
        self._sp_params = self._init_sp_params(opt, rng)
        if "matcher_params" in opt:
            self._matcher_params = opt["matcher_params"]
        elif "lightglue_weights" in opt:
            path = str(opt["lightglue_weights"])
            if path.endswith(".npz"):
                # self-trained checkpoint (scripts/train_lightglue.py)
                from icepy4d_tpu.models.convert import load_params

                self._matcher_params = jax.tree.map(
                    jnp.asarray, load_params(path))
            else:
                from icepy4d_tpu.models.convert import load_torch_lightglue

                self._matcher_params = load_torch_lightglue(
                    path, n_layers=self.matcher.n_layers)
        else:
            self._matcher_params = None
            sp_bundled = getattr(self, "_sp_bundled", False)
            if (self.matcher.n_layers == 9 and self.descriptor_dim == 256
                    and sp_bundled and not _force_random_weights(opt)):
                # default deployment path: committed self-trained
                # checkpoint. Gated on SuperPoint ALSO being the
                # bundled default — it was trained on exactly those
                # descriptors; silently pairing it with a custom
                # extractor would degrade matching with no signal.
                from icepy4d_tpu.models.convert import (bundled_checkpoint,
                                                        load_params)

                path = bundled_checkpoint("lightglue_synthetic.npz")
                if path is not None:
                    logger.info(
                        "LightGlue: bundled self-trained checkpoint %s",
                        path)
                    self._matcher_params = jax.tree.map(
                        jnp.asarray, load_params(path))
            if self._matcher_params is None:
                suffix = ""
                if not sp_bundled and not _force_random_weights(opt):
                    suffix = (" (bundled LightGlue skipped: it is trained"
                              " on the bundled SuperPoint's descriptors,"
                              " but a custom extractor/weights was"
                              " supplied)")
                logger.warning(
                    "LightGlueMatcher: no checkpoint given — random "
                    "weights%s", suffix)
                self._matcher_params = self.matcher.init(rng)

    def _fusable_forward(self) -> bool:
        # match_adaptive segments the layer loop on HOST confidence
        # reads — it cannot be traced inside the fused gather+forward
        return not self._adaptive

    def _run_matcher(self, data: dict) -> dict:
        if self._adaptive:
            out = self.matcher.match_adaptive(
                self._matcher_params, data,
                depth_confidence=self._depth_confidence,
                width_confidence=self._width_confidence)
            return {k: jnp.asarray(v) for k, v in out.items()
                    if k in ("matches0", "matches1", "mscores0", "mscores1")}
        return self.matcher.match(self._matcher_params, data)


class NearestNeighborMatcher(ImageMatcherBase):
    """SuperPoint + mutual-nearest-neighbor cosine matching.

    Not in the reference (its cheapest path is SuperGlue); provided as a
    deterministic classic baseline à la hloc's NN matcher. opt:
    max_keypoints, ratio_threshold (Lowe ratio, default off), and
    distance_threshold (min cosine similarity, default 0.7).
    """

    def _build_models(self, opt: dict) -> None:
        self._sim_th = float(opt.get("distance_threshold", 0.7))
        self._ratio_th = opt.get("ratio_threshold", None)
        rng = jax.random.PRNGKey(int(opt.get("seed", 0)))
        self._sp_params = self._init_sp_params(opt, rng)

    @partial(jax.jit, static_argnums=0)
    def _nn(self, d0, d1, mask0, mask1):
        sim = jnp.einsum("bmd,bnd->bmn", d0, d1,
                         preferred_element_type=jnp.float32)
        neg = jnp.finfo(sim.dtype).min
        sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, neg)
        m1 = jnp.argmax(sim, axis=1)
        best, second, m0 = top2_last(sim)
        inds = jnp.arange(sim.shape[1])[None]
        mutual = inds == jnp.take_along_axis(m1, m0, 1)
        ok = mutual & (best > self._sim_th) & mask0
        if self._ratio_th is not None:
            ok &= second < float(self._ratio_th) * best
        return (jnp.where(ok, m0, -1).astype(jnp.int32),
                jnp.where(ok, best, 0.0))

    def _run_matcher(self, data: dict) -> dict:
        matches0, scores0 = self._nn(
            data["desc0"], data["desc1"], data["mask0"], data["mask1"])
        return {"matches0": matches0, "mscores0": scores0}


@jax.jit
def _split_stacked_pair(feats: dict):
    """Split a batch-2 feature dict into two batch-1 dicts, fused."""
    return (jax.tree.map(lambda a: a[:1], feats),
            jax.tree.map(lambda a: a[1:], feats))


class SIFTMatcher(NearestNeighborMatcher):
    """TPU-native SIFT + Lowe-ratio nearest-neighbor matching.

    The offline wide-baseline path: needs NO pretrained weights (which
    are env-blocked) yet survives the ~45 deg Belvedere stereo baseline
    — measured on the real 1200x800 pair: ~6200 putative at ratio 0.95,
    ~100 MAGSAC inliers with geometrically correct pose (vs 4 putative
    for random-weight learned matchers). Not in the reference (which
    relies on downloaded SuperGlue/LightGlue checkpoints); equivalent
    in role to hloc's classical SIFT+NN baseline.

    opt keys: max_keypoints (16384), ratio_threshold (0.95, Lowe's
    distance ratio), mutual (False — one-way recovers more putatives;
    GV prunes), contrast_threshold (0.015), edge_threshold (12),
    upsample (True).

    Wide-baseline caveat: guided rematch amplifies whatever F guides
    it. On extreme baselines the stage-1 putative set can be 1-2%
    inliers, where a blind RANSAC F may be plane-locked or
    chance-supported — the epipolar band then fills with F-consistent
    but depth-INconsistent matches (they pass GV yet collapse at
    essential-pose time). When surveyed geometry exists, pass
    ``F_prior`` (the pipeline's GCP-prior path, pipeline._gcp_prior,
    does this automatically); without a prior, validate downstream
    with RelativeOrientation before trusting the guided set.
    """

    def _build_models(self, opt: dict) -> None:
        self._opt.setdefault("extractor", "sift")
        if int(opt.get("max_keypoints", -1)) <= 0:
            self._max_keypoints = 16384
        # permissive-ratio NN produces MANY putatives by design (the
        # quality-guided GV prunes); don't cap them at the default 4096
        self._opt.setdefault("max_matches_per_pair", self._max_keypoints)
        self._ratio_th = float(opt.get("ratio_threshold", 0.95))
        self._mutual = bool(opt.get("mutual", False))
        # epipolar-guided rematch rounds (classic two-stage SfM
        # matching): once GV yields an F, NN-match again restricted to
        # the epipolar band — distractors outside the band vanish, so a
        # STRICT ratio+mutual test passes far more true correspondences
        # (measured on the real pair with a surveyed-target ground-truth
        # pose: 21 -> ~900 depth-consistent matches). The band only
        # constrains matches to 1-D, so strictness is what keeps the
        # precision: permissive settings would flood GV with
        # epipolar-consistent junk. 0 rounds = off.
        self._guided_rounds = int(opt.get("guided_rounds", 2))
        self._guided_band = float(opt.get("guided_band_px", 3.0))
        self._guided_ratio = float(opt.get("guided_ratio", 0.9))
        self._guided_min_sim = float(opt.get("guided_min_sim", 0.7))
        self._sp_params = {}  # SIFT is parameter-free
        self._cached = None   # (feats0, feats1, scale) of the last pair

    def _match_full(self, img0, img1, max_keypoints: int | None = None):
        k = max_keypoints or self._max_keypoints
        if img0.shape == img1.shape:
            feats = self._extract(jnp.stack([img0, img1]), k)
            # ONE fused split program: eager per-leaf slicing cost 8
            # remote op-compiles + 8 tunnel round trips per epoch
            feats0, feats1 = _split_stacked_pair(feats)
        else:
            feats0 = self._extract(img0[None], k)
            feats1 = self._extract(img1[None], k)
        self._cached = (feats0, feats1)
        self._store_feat_cache(
            (1, int(img0.shape[0]), int(img0.shape[1]), k),
            feats0, feats1)
        size0 = (int(img0.shape[1]), int(img0.shape[0]))
        size1 = (int(img1.shape[1]), int(img1.shape[0]))
        idx = np.zeros(1, np.int32)
        self._pair_bucket = 1
        out = self._match_pair_batch(
            feats0, feats1, idx, idx, np.ones(1, bool), size0, size1)
        zero = np.zeros((1, 2), np.float32)
        return self._assemble(feats0, feats1, out, idx, idx, zero, zero)

    @partial(jax.jit, static_argnums=0)
    def _nn_epipolar(self, d0, d1, k0, k1, mask0, mask1, F, band):
        """Lowe-ratio NN restricted to the epipolar band of F.

        k0/k1 in the SAME pixel frame as F. Point-line distances both
        directions; candidates outside `band` px are masked out of the
        similarity matrix BEFORE the ratio test."""
        h0 = jnp.concatenate([k0, jnp.ones_like(k0[..., :1])], -1)
        h1 = jnp.concatenate([k1, jnp.ones_like(k1[..., :1])], -1)
        l1 = jnp.einsum("rc,bnc->bnr", F, h0)         # lines in im1
        l0 = jnp.einsum("cr,bmc->bmr", F, h1)         # lines in im0
        num = jnp.einsum("bmr,bnr->bnm", h1, l1)      # (B, N0, N1)^T care
        # num[b, i, j] = h1_j . l1_i
        d_1 = jnp.abs(num) / jnp.maximum(jnp.linalg.norm(
            l1[..., :2], axis=-1)[:, :, None], 1e-9)
        d_0t = jnp.abs(num) / jnp.maximum(jnp.linalg.norm(
            l0[..., :2], axis=-1)[:, None, :], 1e-9)
        inband = (d_1 < band) & (d_0t < band)

        sim = jnp.einsum("bmd,bnd->bmn", d0, d1,
                         preferred_element_type=jnp.float32)
        neg = jnp.finfo(sim.dtype).min
        ok_pair = mask0[:, :, None] & mask1[:, None, :] & inband
        sim = jnp.where(ok_pair, sim, neg)
        s1, s2, m0 = top2_last(sim)
        r2 = self._guided_ratio ** 2
        ok = (1.0 - s1) < r2 * (1.0 - s2)
        # lone in-band candidates (no second neighbor) pass outright
        ok |= (s2 <= neg / 2)
        # mutual + similarity floor: the band reduces matching to 1-D,
        # so descriptor strictness carries the precision
        m1 = jnp.argmax(sim, axis=1)
        inds = jnp.arange(sim.shape[1])[None]
        ok &= inds == jnp.take_along_axis(m1, m0, 1)
        ok &= mask0 & (s1 > self._guided_min_sim)
        return (jnp.where(ok, m0, -1).astype(jnp.int32),
                jnp.where(ok, s1, 0.0))

    def _guided_rematch(self, threshold: float, confidence: float,
                        gv_method, scale: float, guide) -> None:
        """Epipolar-guided second matching pass over the cached
        full-image features + fresh GV; overwrites the match results."""
        feats0, feats1 = self._cached
        # host numpy 3x3 math: eager device ops here cost a tunnel
        # round trip per epoch (the jit boundary converts F anyway)
        F = np.asarray(guide, np.float32)
        if scale != 1.0:
            # cached kpts live at the quality scale; F is in original px
            S = np.diag(np.asarray([1.0 / scale, 1.0 / scale, 1.0],
                                   np.float32))
            F = S.T @ F @ S
        m0, conf = self._nn_epipolar(
            feats0["descriptors"], feats1["descriptors"],
            feats0["keypoints"], feats1["keypoints"],
            feats0["mask"], feats1["mask"], F,
            jnp.float32(self._guided_band * scale))
        m0 = np.asarray(m0)[0]
        conf = np.asarray(conf)[0]
        sel = m0 > -1
        k0 = np.asarray(feats0["keypoints"])[0]
        k1 = np.asarray(feats1["keypoints"])[0]
        d0 = np.asarray(feats0["descriptors"])[0]
        d1 = np.asarray(feats1["descriptors"])[0]
        s0 = np.asarray(feats0["scores"])[0]
        s1 = np.asarray(feats1["scores"])[0]
        j = m0[sel]
        self._mkpts0 = (k0[sel] / scale).astype(np.float32)
        self._mkpts1 = (k1[j] / scale).astype(np.float32)
        self._descriptors0 = d0[sel].T.astype(np.float32)
        self._descriptors1 = d1[j].T.astype(np.float32)
        self._scores0 = s0[sel].astype(np.float32)
        self._scores1 = s1[j].astype(np.float32)
        self._mconf = conf[sel].astype(np.float32)
        logger.info("guided rematch: %d putative matches in the "
                    "epipolar band", len(self._mconf))
        F2, mask = geometric_verification(
            self._mkpts0, self._mkpts1, method=gv_method,
            threshold=threshold, confidence=confidence,
            scores=self._mconf)
        if F2 is not None:
            self._F = F2
        self._inlier_mask = mask
        self._filter_matches_by_mask(mask)

    def match(self, image0, image1, **config):
        F_prior = config.pop("F_prior", None)
        gv_method = config.get(
            "geometric_verification", GeometricVerification.PYDEGENSAC)
        if (F_prior is not None and self._guided_rounds > 0
                and config.get("tile_selection", TileSelection.NONE)
                is TileSelection.NONE
                and gv_method is not GeometricVerification.NONE):
            # a surveyed prior makes the stage-1 blind GV redundant:
            # its only product (an F to guide with) is already known —
            # skip it (it is the most expensive RANSAC of the epoch)
            config = dict(config)
            config["geometric_verification"] = GeometricVerification.NONE
        out = super().match(image0, image1, **config)
        # the guide: a surveyed a-priori F (GCP-resected pair geometry)
        # beats the stage-1 GV estimate, which on 1-2% inlier putative
        # sets can be plane-locked or chance-supported
        guide = F_prior if F_prior is not None else self._F
        if (self._guided_rounds > 0 and guide is not None
                and self._cached is not None
                and gv_method is not GeometricVerification.NONE
                and config.get("tile_selection", TileSelection.NONE)
                is TileSelection.NONE):
            quality = config.get("quality", Quality.HIGH)
            scale = QUALITY_SCALE[quality]
            prev = None
            for r in range(self._guided_rounds):
                self._guided_rematch(
                    float(config.get("threshold", 1.0)),
                    float(config.get("confidence", 0.9999)),
                    gv_method, scale, guide)
                # converged? (with a pinned surveyed prior the guide
                # never moves, so round 2+ reproduces round 1 exactly —
                # skip the redundant NN+GV pass)
                cur = (len(self._mkpts0),
                       int(self._inlier_mask.sum())
                       if self._inlier_mask is not None else 0)
                if cur == prev or F_prior is not None:
                    break
                prev = cur
                # later rounds re-guide with the refined F
                if self._F is not None:
                    guide = self._F
            self.timer.update("guided_rematch")
            self.timer.print("[Matching+guided]")
        return out

    @partial(jax.jit, static_argnums=0)
    def _nn(self, d0, d1, mask0, mask1):
        sim = jnp.einsum("bmd,bnd->bmn", d0, d1,
                         preferred_element_type=jnp.float32)
        neg = jnp.finfo(sim.dtype).min
        sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, neg)
        s1, s2, m0 = top2_last(sim)
        # Lowe ratio on Euclidean distances of unit descriptors:
        # d^2 = 2 - 2s  =>  accept iff (1 - s1) < r^2 (1 - s2)
        r2 = self._ratio_th ** 2
        ok = (1.0 - s1) < r2 * (1.0 - s2)
        ok &= mask0 & (s1 > neg / 2)
        if self._mutual:
            m1 = jnp.argmax(sim, axis=1)
            inds = jnp.arange(sim.shape[1])[None]
            ok &= inds == jnp.take_along_axis(m1, m0, 1)
        return (jnp.where(ok, m0, -1).astype(jnp.int32),
                jnp.where(ok, s1, 0.0))


@partial(jax.jit, static_argnames=("net", "pool"))
def _dense_grid(net, params, tiles: jnp.ndarray, pool: int) -> dict:
    """Grid tokens from SuperPoint's dense descriptor map: keypoints at
    (8*pool)-px cell centers, L2-normalized pooled descriptors."""
    imgs = tiles[..., None] if tiles.ndim == 3 else tiles
    b, h, w = imgs.shape[:3]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        imgs = jnp.pad(imgs, ((0, 0), (0, ph), (0, pw), (0, 0)))
    _, dense = net.apply(params, imgs)        # (B, H/8, W/8, D)
    if pool > 1:
        dense = jax.lax.reduce_window(
            dense, 0.0, jax.lax.add, (1, pool, pool, 1),
            (1, pool, pool, 1), "VALID") / (pool * pool)
    d = dense / jnp.maximum(
        jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-12)
    gh, gw = d.shape[1:3]
    stride = 8 * pool
    ys, xs = jnp.mgrid[0:gh, 0:gw]
    kpts = jnp.stack([xs * stride + stride / 2 - 0.5,
                      ys * stride + stride / 2 - 0.5],
                     -1).astype(jnp.float32)
    valid = (kpts[..., 0] < w) & (kpts[..., 1] < h)
    k = gh * gw
    return {
        "keypoints": jnp.broadcast_to(kpts.reshape(1, k, 2), (b, k, 2)),
        "descriptors": d.reshape(b, k, -1),
        "scores": jnp.ones((b, k), jnp.float32),
        "mask": jnp.broadcast_to(valid.reshape(1, k), (b, k)),
    }


class SemiDenseMatcher(NearestNeighborMatcher):
    """Detector-free semi-dense matcher — fills the reference's
    LOFTRMatcher role (matchers.py:1005-1199) with a TPU-native design:
    every grid cell of SuperPoint's dense descriptor map is a token (no
    detection step), tokens are matched by mutual-NN cosine, and the
    standard tiling/GV pipeline applies. Grid stride = 8 * pool
    (opt "grid_pool", default 2 -> 16 px cells).

    Like LoFTR it returns keypoints without descriptoral sparsity —
    useful on weak-texture surfaces (snow/ice) where detectors starve.

    opt "refine" (default True) adds LoFTR's fine stage analogue: each
    coarse match is refined to subpixel with the OC template correlator
    (matching/templatematch.py) seeded at the coarse displacement.
    """

    def _build_models(self, opt: dict) -> None:
        super()._build_models(opt)
        self._grid_pool = int(opt.get("grid_pool", 2))
        self._sim_th = float(opt.get("distance_threshold", 0.8))
        self._refine = bool(opt.get("refine", True))
        self._refine_template = int(opt.get("refine_template", 16))
        self._refine_search = int(opt.get("refine_search", 32))

    def _refine_matches(self, img0, img1, mk0, mk1):
        """Subpixel refinement of coarse grid matches by orientation
        correlation; failures keep the coarse position."""
        from icepy4d_tpu.matching.templatematch import forient, oc_track

        if len(mk0) == 0:
            return mk1
        A = forient(jnp.asarray(img0, jnp.float32))
        B = forient(jnp.asarray(img1, jnp.float32))
        res = oc_track(
            A, B, mk0,
            template_width=self._refine_template,
            search_width=self._refine_search,
            initialdu=(mk1[:, 0] - mk0[:, 0]).astype(np.float64),
            initialdv=(mk1[:, 1] - mk0[:, 1]).astype(np.float64),
        )
        ok = np.isfinite(res.du) & (res.snr > 1.5)
        refined = mk1.copy()
        # pu/pv are the rounded centers actually used by the correlator
        refined[ok, 0] = (res.pu + res.du)[ok] + (mk0[ok, 0] - res.pu[ok])
        refined[ok, 1] = (res.pv + res.dv)[ok] + (mk0[ok, 1] - res.pv[ok])
        logger.info("semi-dense refinement: %d / %d matches refined",
                    int(ok.sum()), len(ok))
        return refined.astype(np.float32)

    def _match_full(self, img0, img1, max_keypoints=None):
        res = super()._match_full(img0, img1, max_keypoints)
        if self._refine and len(res[0]):
            mk0, mk1, d0, d1, s0, s1, conf = res
            mk1 = self._refine_matches(np.asarray(img0), np.asarray(img1),
                                       mk0, mk1)
            res = (mk0, mk1, d0, d1, s0, s1, conf)
        return res

    def _extract(self, tiles: jnp.ndarray, max_keypoints: int) -> dict:
        sp = self._superpoint(max_keypoints)
        t, h, w = tiles.shape[:3]
        chunk = self._auto_chunk(t, h * w * 64 * 4)
        outs = [_dense_grid(sp.net, self._sp_params, tiles[i:i + chunk],
                            self._grid_pool)
                for i in range(0, t, chunk)]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)


class LoFTRMatcher(ImageMatcherBase):
    """Exact-architecture LoFTR matcher (ref matchers.py:1005-1199).

    Runs models/loftr.py — the same network kornia's ``KF.LoFTR``
    implements, natively in JAX — inside the standard match() pipeline
    (quality ladder, tiling, geometric verification). Detector-free:
    SuperPoint is never built; keypoints come from the coarse grid with
    subpixel fine refinement, and descriptors are the 128-d fine center
    features (the reference returns none).

    opt keys: loftr_weights (official torch .ckpt path; "matcher."
    prefixes are stripped) / matcher_params (ready pytree), confidence
    _threshold (0.2), max_matches per pair (1024), temp_bug_fix (False
    = published outdoor/indoor checkpoints), precision.

    For the fast grid-token alternative keep using SemiDenseMatcher.
    """

    def _build_models(self, opt: dict) -> None:
        from icepy4d_tpu.models.loftr import LoFTR

        self.matcher = LoFTR(
            thr=float(opt.get("confidence_threshold", 0.2)),
            max_matches=int(opt.get("max_matches", 1024)),
            temp_bug_fix=bool(opt.get("temp_bug_fix", False)),
            precision=str(opt.get("precision", "default")),
        )
        if "matcher_params" in opt:
            self._matcher_params = opt["matcher_params"]
        elif "loftr_weights" in opt:
            from icepy4d_tpu.models.convert import load_torch_loftr

            self._matcher_params = load_torch_loftr(opt["loftr_weights"])
        else:
            logger.warning("LoFTRMatcher: no checkpoint given — random "
                           "weights")
            self._matcher_params = self.matcher.init(
                jax.random.PRNGKey(int(opt.get("seed", 0))))

    @property
    def descriptor_dim(self) -> int:
        return 128

    def _extract(self, tiles, max_keypoints):
        raise NotImplementedError(
            "LoFTRMatcher is detector-free: temporal tracking seeds "
            "(track_features) need a detector-based matcher "
            "(LightGlue/SuperGlue/NN/SemiDense). Configure "
            "matching.matcher accordingly when proc.do_tracking is on.")

    def _extract_host(self, *a, **k):
        self._extract(None, None)

    def _out_to_host(self, out, origin0=None, origin1=None):
        valid = np.asarray(out["valid"])
        mk0 = np.asarray(out["keypoints0"], np.float32)[valid]
        mk1 = np.asarray(out["keypoints1"], np.float32)[valid]
        d0 = np.asarray(out["descriptors0"], np.float32)[valid]
        d1 = np.asarray(out["descriptors1"], np.float32)[valid]
        conf = np.asarray(out["confidence"], np.float32)[valid]
        if origin0 is not None:
            pair_id = np.broadcast_to(
                np.arange(valid.shape[0])[:, None], valid.shape)[valid]
            mk0 = mk0 + origin0[pair_id]
            mk1 = mk1 + origin1[pair_id]
        return mk0, mk1, d0, d1, conf, conf, conf

    def _match_full(self, img0, img1, max_keypoints=None):
        out = self.matcher.match_pair(
            self._matcher_params, jnp.asarray(img0), jnp.asarray(img1))
        return self._out_to_host(out)

    def _match_tiled(
        self,
        img0,
        img1,
        tile_selection: TileSelection,
        grid,
        overlap: int,
        origin,
        min_matches_per_tile: int,
    ):
        prep = self._prepare_tile_pairs(
            img0, img1, tile_selection, grid, overlap, origin,
            min_matches_per_tile)
        if prep is None:
            return self._empty_result()
        tiler0, tiler1, idx0, idx1, pair_valid = prep
        bucket = len(idx0)

        tiles0 = tiler0.extract_all(img0)
        tiles1 = tiler1.extract_all(img1)

        th, tw = tiler0.tile_size
        # sim matrix (L0 x L1) + fine windows dominate activation memory
        l_c = (th // 8) * (tw // 8)
        chunk = self._auto_chunk(bucket, l_c * l_c * 4 * 2 + th * tw * 600)
        outs = []
        for i in range(0, bucket, chunk):
            outs.append(self.matcher.match_batch(
                self._matcher_params,
                jnp.asarray(tiles0[idx0[i:i + chunk]]),
                jnp.asarray(tiles1[idx1[i:i + chunk]]),
                jnp.asarray(pair_valid[i:i + chunk])))
        out = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)

        org0 = tiler0.tile_origins().astype(np.float32)[idx0]
        org1 = tiler1.tile_origins().astype(np.float32)[idx1]
        res = self._out_to_host(out, org0, org1)
        return self._dedup(*res)


# capability-parity alias: the reference names the class LOFTRMatcher
# (matchers.py:1005); LoFTRMatcher above is the exact architecture.
LOFTRMatcher = LoFTRMatcher


class SuperGlueMatcher(ImageMatcherBase):
    """SuperPoint + SuperGlue (ref matchers.py:826-1002).

    Defaults mirror _build_superglue_config (matchers.py:854-890):
    keypoint_threshold 0.001, nms_radius 3, sinkhorn_iterations 20,
    match_threshold 0.3.
    """

    def __init__(self, opt: dict | None = None) -> None:
        opt = dict(opt or {})
        opt.setdefault("keypoint_threshold", 0.001)
        opt.setdefault("nms_radius", 3)
        super().__init__(opt)

    def _build_models(self, opt: dict) -> None:
        self.matcher = SuperGlue(
            sinkhorn_iterations=int(opt.get("sinkhorn_iterations", 20)),
            match_threshold=float(opt.get("match_threshold", 0.3)),
        )
        rng = jax.random.PRNGKey(int(opt.get("seed", 0)))
        self._sp_params = self._init_sp_params(opt, rng)
        if "matcher_params" in opt:
            self._matcher_params = opt["matcher_params"]
        elif "superglue_weights" in opt:
            from icepy4d_tpu.models.convert import load_torch_superglue

            self._matcher_params = load_torch_superglue(
                opt["superglue_weights"])
        else:
            logger.warning(
                "SuperGlueMatcher: no checkpoint given — random weights")
            self._matcher_params = self.matcher.init(rng)

    def _matcher_data_extra(self, feats, idx, side: int) -> dict:
        return {f"scores{side}": feats["scores"][idx]}

    def _run_matcher(self, data: dict) -> dict:
        return self.matcher.match(self._matcher_params, data)
