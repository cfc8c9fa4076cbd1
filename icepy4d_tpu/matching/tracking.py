"""Temporal feature tracking — the "4D" core.

Re-design of the reference's seeded matching (matching/track_matches.py:
86-453 + matching/matching_tracking.py:24-208): the previous epoch's
keypoints/descriptors are injected as the matcher's side-0 token set
(the extractor runs only on the NEW image), so matches carry stable
track_ids forward in time. A feature survives only if it is re-found in
BOTH cameras (ref track_matches.py:353-363).

TPU-first shape handling: seeds are bucketed per tile on the host
(tiny), then ALL tiles ride one vmapped matcher forward with padded
static shapes — no per-tile python matching loop.

Compile-cache discipline (the round-5 fix): through a remote-TPU tunnel
a fresh compile costs MINUTES, so tracking must hit the EXACT programs
the pair match already compiled. Three rules implement that:

1. the new image is extracted through the same entry points as pair
   matching — `_extract_tiled` with the pair grid/overlap (tiled), or
   one batch-2 `_extract` over both cameras' new images (full-frame,
   matching `_match_full`'s stacked batch-2 program);
2. seeded matching goes through `_match_pair_batch` with the tile-pair
   batch padded to the SAME power-of-two bucket the pair match used
   (`matcher._pair_bucket`), so the fused gather+match program is a
   cache hit;
3. only matched rows cross the 50 MB/s host link: matches0/mscores0
   download first (tiny), then one small device gather pulls the
   matched keypoints/descriptors(f16)/scores.

With these, epochs 1..N of a season add ZERO device compiles over
epoch 0.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.core.features import Features
from icepy4d_tpu.matching.tiling import Tiler

logger = logging.getLogger("icepy4d_tpu")


def _round_up_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@jax.jit
def _gather_matched(kpts, desc, scores, tidx, jidx):
    """Pull matched rows (tile tidx, slot jidx) out of the on-device
    tile features; descriptors cross the link as float16 (see
    matchers._compact_on_device for the precision argument)."""
    return (kpts[tidx, jidx],
            desc[tidx, jidx].astype(jnp.float16),
            scores[tidx, jidx])


def _check_seedable(matcher) -> None:
    from icepy4d_tpu.matching.matchers import LoFTRMatcher

    if isinstance(matcher, LoFTRMatcher):
        # keep the legacy behavior: LoFTR's _extract raises
        matcher._extract(None, None)


def _seed_tiler(matcher, img_shape, grid, overlap) -> Tiler:
    tiler = Tiler(grid=list(grid), overlap=int(overlap))
    tiler.compute_limits_by_grid(np.empty(img_shape[:2]))
    return tiler


def _bucket_seeds(prev_kpts: np.ndarray, tiler: Tiler, k: int):
    """Assign each seed to its MOST INTERIOR containing tile (ties the
    seeded matching to the pair match's possibly-overlapping tile grid)
    and pack per-tile slot arrays. Returns (seed_idx (T,K) int,
    seed_valid (T,K) bool)."""
    t = tiler.n_tiles
    n = len(prev_kpts)
    lim = np.array([tiler.limits[i] for i in range(t)], np.float32)
    x = prev_kpts[None, :, 0]
    y = prev_kpts[None, :, 1]
    margin = np.minimum.reduce([
        x - lim[:, 0:1], y - lim[:, 1:2],
        lim[:, 2:3] - x, lim[:, 3:4] - y])          # (T, N)
    tile_of = np.argmax(margin, axis=0)             # (N,)
    seed_idx = np.zeros((t, k), np.int64)
    seed_valid = np.zeros((t, k), bool)
    for ti in range(t):
        rows = np.flatnonzero(tile_of == ti)
        if len(rows) > k:
            logger.warning(
                "tile %d: %d seeds exceed matcher capacity %d — %d "
                "tracks dropped (raise max_keypoints or tracking grid)",
                ti, len(rows), k, len(rows) - k)
            rows = rows[:k]
        seed_idx[ti, : len(rows)] = rows
        seed_valid[ti, : len(rows)] = True
    return seed_idx, seed_valid


def _match_seeds(matcher, seed_feats: dict, new_feats: dict,
                 t: int, th: int, tw: int):
    """Seeded tile-diagonal matcher forward, padded to the pair match's
    pair bucket so the compiled program is reused. Returns (m0, conf)
    host arrays of shape (T, K)."""
    bucket = max(_round_up_pow2(t),
                 int(getattr(matcher, "_pair_bucket", 0) or 0))
    idx = np.zeros(bucket, np.int32)
    idx[:t] = np.arange(t)
    pv = np.arange(bucket) < t
    out = matcher._match_pair_batch(
        seed_feats, new_feats, idx, idx, pv, (tw, th), (tw, th))
    # tiny transfer: slot indices + confidences only
    m0 = np.asarray(out["matches0"])[:t]
    conf = np.asarray(out["mscores0"])[:t]
    return m0, conf


def _collect_tracks(seed_idx, seed_valid, m0, conf, new_feats,
                    origins: np.ndarray, scale: float, n: int, d: int):
    """Host bookkeeping + one device gather of the matched rows.

    Returns (new_kpts (N,2) full-res, found (N,), new_descr (N,D),
    new_scores (N,))."""
    matched = seed_valid & (m0 > -1)
    tis, sls = np.nonzero(matched)                   # tile, slot pairs
    rows = seed_idx[tis, sls]                        # original seed row
    jidx = m0[tis, sls]
    new_kpts = np.zeros((n, 2), np.float32)
    new_descr = np.zeros((n, d), np.float32)
    new_scores = np.zeros((n,), np.float32)
    found = np.zeros((n,), bool)
    if len(rows):
        from icepy4d_tpu.ops.buckets import pad_bucket

        # pow4 ladder: the found-track count varies per epoch; even a
        # trivial gather program costs a remote compile per new shape
        pad = pad_bucket(len(rows))
        tpad = np.zeros(pad, np.int32)
        jpad = np.zeros(pad, np.int32)
        tpad[: len(rows)] = tis
        jpad[: len(rows)] = jidx
        k_dev, d_dev, s_dev = _gather_matched(
            new_feats["keypoints"], new_feats["descriptors"],
            new_feats["scores"], jnp.asarray(tpad), jnp.asarray(jpad))
        kg = np.asarray(k_dev)[: len(rows)]
        dg = np.asarray(d_dev)[: len(rows)].astype(np.float32)
        sg = np.asarray(s_dev)[: len(rows)]
        new_kpts[rows] = (kg + origins[tis]) / scale
        new_descr[rows] = dg
        new_scores[rows] = sg
        found[rows] = True
    return new_kpts, found, new_descr, new_scores


def _seed_feats_device(seed_kpts, seed_descr, seed_scores, seed_valid):
    """Package host seed arrays as the extractor-output dict shape the
    fused gather+match program expects (same keys/dtypes as
    SuperPoint.extract: keypoints f32, descriptors f32, scores f32,
    mask bool)."""
    return {
        "keypoints": jnp.asarray(seed_kpts, jnp.float32),
        "descriptors": jnp.asarray(seed_descr, jnp.float32),
        "scores": jnp.asarray(seed_scores, jnp.float32),
        "mask": jnp.asarray(seed_valid),
    }


def _preproc_shape(shape, qname: str) -> tuple[int, int]:
    """Host-side mirror of matchers._preprocess's output shape (the
    quality ladder's pyrDown keeps ceil-halves, pyrUp doubles)."""
    h, w = int(shape[0]), int(shape[1])
    if qname == "highest":
        return 2 * h, 2 * w
    if qname == "high":
        return h, w
    if qname == "medium":
        return (h + 1) // 2, (w + 1) // 2
    return ((h + 1) // 2 + 1) // 2, ((w + 1) // 2 + 1) // 2  # low


def _extract_new(matcher, origs: list, tiler: Tiler, k: int,
                 qname: str) -> list:
    """Tile features for each new image, through the SAME programs the
    pair match compiled.

    Fast path: when the matcher just matched these very image objects
    at this tile signature (`matcher._feat_cache`, written by the
    top-level match), its device features are reused outright — no
    preprocessing, no extractor forward. The pipeline runs tracking
    right after the pair match on the same frames, so a season pays
    ONE extraction per image instead of two.

    Slow path by tiling:
    - tiled grids: `_extract_tiled` per image (the `_match_tiled`
      program) when the matcher uses the stock extractor; the matcher's
      own `_extract` override otherwise (SemiDense's dense grid);
    - single tile: ONE stacked batch-2 `_extract` over both images
      (the `_match_full` program). An odd image count pads the batch by
      repeating the last image.
    Returns one feature dict per image (leading dim = n_tiles).
    """
    from icepy4d_tpu.matching.matchers import (ImageMatcherBase,
                                               _host_gray, _preprocess)

    t = tiler.n_tiles
    th, tw = tiler.tile_size
    cache = getattr(matcher, "_feat_cache", None)
    if (cache is not None and len(origs) == 2
            and cache["sig"] == (t, th, tw, k)
            and cache["ids"] == tuple(id(o) for o in origs)):
        return list(cache["feats"])

    imgs = [_preprocess(jnp.asarray(_host_gray(o)), qname) for o in origs]
    stock = type(matcher)._extract is ImageMatcherBase._extract
    if t > 1:
        if stock:
            return [matcher._extract_tiled(g, tiler.tile_origins(),
                                           th, tw, k) for g in imgs]
        return [matcher._extract(tiler.extract_all(g), k) for g in imgs]
    if len(imgs) == 2 and imgs[0].shape == imgs[1].shape:
        feats = matcher._extract(jnp.stack(imgs), k)
        return [jax.tree.map(lambda a, i=i: a[i:i + 1], feats)
                for i in range(2)]
    out = []
    for g in imgs:
        feats = matcher._extract(jnp.stack([g, g]), k)
        out.append(jax.tree.map(lambda a: a[:1], feats))
    return out


def _track_prepared(matcher, prev_kpts, prev_descr, prev_scores,
                    new_feats: dict, tiler: Tiler, scale: float):
    """Seeded matching of already-scaled seeds against already-extracted
    new-image tile features."""
    n, d = prev_descr.shape
    k = int(matcher._max_keypoints)
    th, tw = tiler.tile_size
    origins = tiler.tile_origins().astype(np.float32)
    seed_idx, seed_valid = _bucket_seeds(prev_kpts, tiler, k)
    seed_kpts = prev_kpts[seed_idx] - origins[:, None, :]  # tile-local
    seed_descr = prev_descr[seed_idx]
    seed_scores = np.where(seed_valid, prev_scores[seed_idx], 0.0)
    seed_feats = _seed_feats_device(
        seed_kpts, seed_descr, seed_scores, seed_valid)
    m0, conf = _match_seeds(matcher, seed_feats, new_feats,
                            tiler.n_tiles, th, tw)
    return _collect_tracks(seed_idx, seed_valid, m0, conf, new_feats,
                           origins, scale, n, d)


def track_features(
    matcher,
    prev_kpts: np.ndarray,
    prev_descr: np.ndarray,
    prev_scores: np.ndarray,
    new_image,
    grid=(1, 1),
    quality: str = "high",
    overlap: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Find each previous-epoch feature in `new_image`.

    prev_kpts (N, 2) FULL-RES px; prev_descr (N, D); prev_scores (N,).
    Returns (new_kpts (N, 2) full-res, found (N,) bool, new_descr (N, D),
    new_scores (N,)): new_kpts[i] is the tracked position of feature i.

    `quality` must match the setting the seeds were extracted with —
    descriptors are scale-sensitive, so the new image is resized to the
    same ladder rung before extraction (coords are rescaled back).
    `grid`/`overlap` should match the PAIR match's tiling so the
    compiled extraction/matching programs are reused (see module doc).

    Mirrors the reference's seeding of `Matching` with `keypoints0`
    (track_matches.py:219-232).
    """
    from icepy4d_tpu.matching.enums import QUALITY_SCALE, Quality
    from icepy4d_tpu.matching.matchers import _host_gray

    _check_seedable(matcher)
    scale = QUALITY_SCALE[Quality[quality.upper()]] \
        if isinstance(quality, str) else QUALITY_SCALE[quality]
    prev_kpts = np.asarray(prev_kpts, np.float32) * scale
    prev_descr = np.asarray(prev_descr, np.float32)
    prev_scores = np.asarray(prev_scores, np.float32).reshape(-1)
    qname = quality.lower() if isinstance(quality, str) else "high"
    tiler = _seed_tiler(
        matcher, _preproc_shape(_host_gray(new_image).shape, qname),
        grid, overlap)
    k = int(matcher._max_keypoints)
    new_feats = _extract_new(matcher, [new_image], tiler, k, qname)[0]
    out = _track_prepared(matcher, prev_kpts, prev_descr, prev_scores,
                          new_feats, tiler, scale)
    logger.info("Tracked %d / %d features into new image",
                int(out[1].sum()), len(prev_kpts))
    return out


def track_matches(
    matcher,
    prev_features: dict[str, Features],
    new_images: dict[str, np.ndarray],
    grid=(1, 1),
    quality: str = "high",
    overlap: int = 0,
) -> dict[str, Features]:
    """Propagate the previous epoch's tracked features into a new epoch.

    For every camera, re-find the previous features in the new image;
    keep only features re-found in ALL cameras (the reference's
    `wasMatched sum == 2` rule, track_matches.py:353-363, applied
    per-camera-generically for n >= 2). Cameras may carry different id
    sets (multicam epochs: slaves only hold the tracks they saw) —
    tracking runs on the INTERSECTION of ids present in every camera.
    Returns per-camera Features for the new epoch carrying the old
    track_ids.

    All cameras' new images are preprocessed/extracted together so the
    full-frame path rides the pair match's batch-2 extraction program.
    """
    from icepy4d_tpu.matching.enums import QUALITY_SCALE, Quality
    from icepy4d_tpu.matching.matchers import _host_gray

    _check_seedable(matcher)
    cams = list(prev_features.keys())
    common = None
    for cam in cams:
        ids = prev_features[cam].track_ids_to_numpy()
        common = ids if common is None else np.intersect1d(common, ids)
    track_ids = np.sort(np.asarray(common))
    if len(track_ids) == 0:
        logger.warning("track_matches: no track ids shared by all "
                       "%d cameras", len(cams))
        return {cam: Features(
            descr_dim=prev_features[cam].descr_dim) for cam in cams}

    scale = QUALITY_SCALE[Quality[quality.upper()]] \
        if isinstance(quality, str) else QUALITY_SCALE[quality]
    qname = quality.lower() if isinstance(quality, str) else "high"
    origs = [new_images[cam] for cam in cams]
    tiler = _seed_tiler(
        matcher, _preproc_shape(_host_gray(origs[0]).shape, qname),
        grid, overlap)
    k = int(matcher._max_keypoints)
    all_feats = _extract_new(matcher, origs, tiler, k, qname)

    per_cam = {}
    found_all = np.ones(len(track_ids), bool)
    for cam, new_feats in zip(cams, all_feats):
        f = prev_features[cam]
        ids = f.track_ids_to_numpy()
        # rows of this camera aligned to the sorted common id list
        order = np.argsort(ids)
        pos = order[np.searchsorted(ids[order], track_ids)]
        nk, ok, nd, ns = _track_prepared(
            matcher,
            f.kpts_to_numpy()[pos] * scale,
            f.descr_to_numpy()[pos],
            f.scores_to_numpy()[pos],
            new_feats, tiler, scale)
        per_cam[cam] = (nk, ok, nd, ns, ids[pos])
        found_all &= ok

    out: dict[str, Features] = {}
    for cam in cams:
        nk, ok, nd, ns, ids = per_cam[cam]
        keep = found_all
        feats = Features(descr_dim=nd.shape[1])
        feats.append_features_from_numpy(
            nk[keep], descr=nd[keep], scores=ns[keep],
            track_ids=ids[keep],
        )
        out[cam] = feats
    n_kept = int(found_all.sum())
    logger.info("track_matches: %d features survive in all %d cameras",
                n_kept, len(cams))
    return out
