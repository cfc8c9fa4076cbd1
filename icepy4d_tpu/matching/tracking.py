"""Temporal feature tracking — the "4D" core.

Re-design of the reference's seeded matching (matching/track_matches.py:
86-453 + matching/matching_tracking.py:24-208): the previous epoch's
keypoints/descriptors are injected as the matcher's side-0 token set
(SuperPoint runs only on the NEW image), so matches carry stable
track_ids forward in time. A feature survives only if it is re-found in
BOTH cameras (ref track_matches.py:353-363).

TPU-first shape handling: seeds are bucketed per zero-overlap tile on the
host (tiny), then ALL tiles ride one vmapped matcher forward with padded
static shapes — no per-tile python matching loop.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.core.features import Features
from icepy4d_tpu.matching.tiling import Tiler

logger = logging.getLogger("icepy4d_tpu")


def track_features(
    matcher,
    prev_kpts: np.ndarray,
    prev_descr: np.ndarray,
    prev_scores: np.ndarray,
    new_image,
    grid=(1, 1),
    quality: str = "high",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Find each previous-epoch feature in `new_image`.

    prev_kpts (N, 2) FULL-RES px; prev_descr (N, D); prev_scores (N,).
    Returns (new_kpts (N, 2) full-res, found (N,) bool, new_descr (N, D),
    new_scores (N,)): new_kpts[i] is the tracked position of feature i.

    `quality` must match the setting the seeds were extracted with —
    descriptors are scale-sensitive, so the new image is resized to the
    same ladder rung before extraction (coords are rescaled back).

    Mirrors the reference's seeding of `Matching` with `keypoints0`
    (track_matches.py:219-232) on zero-overlap tiles.
    """
    from icepy4d_tpu.matching.enums import QUALITY_SCALE, Quality
    from icepy4d_tpu.matching.matchers import _preprocess

    scale = QUALITY_SCALE[Quality[quality.upper()]] \
        if isinstance(quality, str) else QUALITY_SCALE[quality]
    prev_kpts = np.asarray(prev_kpts, np.float32) * scale
    prev_descr = np.asarray(prev_descr, np.float32)
    prev_scores = np.asarray(prev_scores, np.float32).reshape(-1)
    n, d = prev_descr.shape
    qname = quality.lower() if isinstance(quality, str) else "high"
    img = _preprocess(jnp.asarray(np.asarray(new_image)), qname)

    tiler = Tiler(grid=list(grid), overlap=0)
    tiler.compute_limits_by_grid(np.empty(img.shape[:2]))
    origins = tiler.tile_origins().astype(np.float32)
    t = tiler.n_tiles
    th, tw = tiler.tile_size

    # host-side seed bucketing: each feature falls in exactly one tile
    tile_of = np.full(n, -1, np.int64)
    slot_rows = [[] for _ in range(t)]
    for i, (x, y) in enumerate(prev_kpts):
        for ti, (x0, y0, x1, y1) in tiler.limits.items():
            if x0 <= x < x1 and y0 <= y < y1:
                tile_of[i] = ti
                slot_rows[ti].append(i)
                break
    k = int(matcher._max_keypoints)
    seed_idx = np.zeros((t, k), np.int64)
    seed_valid = np.zeros((t, k), bool)
    for ti, rows in enumerate(slot_rows):
        if len(rows) > k:
            logger.warning(
                "tile %d: %d seeds exceed matcher capacity %d — %d "
                "tracks dropped (raise max_keypoints or tracking grid)",
                ti, len(rows), k, len(rows) - k)
        rows = rows[:k]
        seed_idx[ti, : len(rows)] = rows
        seed_valid[ti, : len(rows)] = True

    seed_kpts = prev_kpts[seed_idx] - origins[:, None, :]  # tile-local
    seed_descr = prev_descr[seed_idx]
    seed_scores = np.where(seed_valid, prev_scores[seed_idx], 0.0)

    # one batched SuperPoint forward on the new image's tiles
    tiles = tiler.extract_all(img)
    feats1 = matcher._extract(tiles, k)

    size = jnp.broadcast_to(jnp.asarray([tw, th], jnp.float32), (t, 2))
    data = {
        "kpts0": jnp.asarray(seed_kpts),
        "desc0": jnp.asarray(seed_descr),
        "mask0": jnp.asarray(seed_valid),
        "size0": size,
        "scores0": jnp.asarray(seed_scores),
        "kpts1": feats1["keypoints"],
        "desc1": feats1["descriptors"],
        "mask1": feats1["mask"],
        "size1": size,
        "scores1": feats1["scores"],
    }
    out = matcher._run_matcher(data)

    m0 = np.asarray(out["matches0"])                 # (T, K)
    new_tile_kpts = np.asarray(feats1["keypoints"])  # (T, K, 2)
    new_tile_descr = np.asarray(feats1["descriptors"])
    new_tile_scores = np.asarray(feats1["scores"])

    new_kpts = np.zeros((n, 2), np.float32)
    new_descr = np.zeros((n, d), np.float32)
    new_scores = np.zeros((n,), np.float32)
    found = np.zeros((n,), bool)
    for ti in range(t):
        sv = seed_valid[ti]
        matched = sv & (m0[ti] > -1)
        rows = seed_idx[ti][matched]
        j = m0[ti][matched]
        new_kpts[rows] = (new_tile_kpts[ti][j] + origins[ti]) / scale
        new_descr[rows] = new_tile_descr[ti][j]
        new_scores[rows] = new_tile_scores[ti][j]
        found[rows] = True
    logger.info("Tracked %d / %d features into new image",
                int(found.sum()), n)
    return new_kpts, found, new_descr, new_scores


def track_matches(
    matcher,
    prev_features: dict[str, Features],
    new_images: dict[str, np.ndarray],
    grid=(1, 1),
    quality: str = "high",
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
    """
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
    per_cam = {}
    found_all = np.ones(len(track_ids), bool)
    for cam in cams:
        f = prev_features[cam]
        ids = f.track_ids_to_numpy()
        # rows of this camera aligned to the sorted common id list
        order = np.argsort(ids)
        pos = order[np.searchsorted(ids[order], track_ids)]
        aligned = {
            "kpts": f.kpts_to_numpy()[pos],
            "descr": f.descr_to_numpy()[pos],
            "scores": f.scores_to_numpy()[pos],
            "ids": ids[pos],
        }
        nk, ok, nd, ns = track_features(
            matcher, aligned["kpts"], aligned["descr"], aligned["scores"],
            new_images[cam], grid=grid, quality=quality,
        )
        per_cam[cam] = (nk, ok, nd, ns, aligned["ids"])
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
