"""Self-training LightGlue on homography-supervised correspondences.

The official LightGlue checkpoint is unavailable offline, so the
matcher head is trained here the way the original was bootstrapped
(Lindenberger et al. 2023 §4.1 "pre-training with homographies";
supervision construction mirrors ref
thirdparty/LightGlue/lightglue/lightglue.py:309-585's assignment
semantics): pairs are real glacier frames (plus synthetic-geometry
canvases) warped by random homographies, keypoints + descriptors come
from the self-trained SuperPoint (training/superpoint_train.py,
weights/superpoint_synthetic.npz), and the ground-truth assignment is
the mutual-nearest reprojection under the known homography.

Losses (paper eq. 10):
  - per-layer deep supervision: every layer's assignment head is
    pushed toward the GT assignment (matched pairs -> their cell of
    the log-assignment matrix; unmatchable points -> the dustbin
    row/col, which under sigmoid_log_double_softmax is
    log(1 - matchability));
  - confidence heads: binary CE against "does this layer already
    agree with the final layer" (paper §3.3) — the signal that makes
    adaptive depth (models/lightglue.py::match_adaptive) meaningful
    with self-trained weights. Features feeding the confidence heads
    are stop_gradient-ed so this auxiliary loss cannot corrupt the
    matcher representation.

TPU-idiomatic loop (same shape as superpoint_train.py): the whole
cached dataset is device-resident, `lax.scan` runs many optimizer
steps per dispatch (a remote-tunnel round trip costs ~1 s), all
shapes static.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.models.lightglue import (
    LightGlue,
    cross_block,
    filter_matches,
    match_assignment,
    normalize_keypoints,
    rotary_encoding,
    self_block,
    _linear,
)

Array = jax.Array

__all__ = [
    "gt_assignment",
    "assignment_nll",
    "forward_all_layers",
    "make_train_step",
    "make_lightglue_dataset",
    "collect_epoch_pairs",
    "make_correspondence_dataset",
    "homography_to_explicit",
    "train_lightglue",
    "evaluate_matching",
]


# -- supervision ---------------------------------------------------------------

def gt_assignment(
    kpts0: Array,
    kpts1: Array,
    H: Array,
    mask0: Array,
    mask1: Array,
    pos_th: float = 3.0,
    neg_th: float = 6.0,
) -> tuple[Array, Array, Array]:
    """Ground-truth matches of two keypoint sets under a homography.

    kpts0 (B, M, 2) xy in image 0; H (B, 3, 3) maps image-0 pixels to
    image 1. A pair (i, j) is a GT match iff it is the MUTUAL nearest
    neighbour of the reprojection and the reprojection error is
    < pos_th px. Points whose nearest reprojection is > neg_th px are
    GT-unmatchable (dustbin supervision); the band in between is
    ambiguous and supervised as neither (ignored).

    Returns (gt0 (B, M) int32 [-1 = no match], unm0 (B, M) bool,
    unm1 (B, N) bool)."""
    B, M, _ = kpts0.shape
    N = kpts1.shape[1]
    ones = jnp.ones_like(kpts0[..., :1])
    p = jnp.concatenate([kpts0, ones], -1) @ H.transpose(0, 2, 1)
    p = p[..., :2] / jnp.where(jnp.abs(p[..., 2:]) < 1e-9, 1e-9,
                               p[..., 2:])
    d2 = jnp.sum((p[:, :, None, :] - kpts1[:, None, :, :]) ** 2, -1)
    valid = mask0[:, :, None] & mask1[:, None, :]
    d2 = jnp.where(valid, d2, jnp.inf)
    nn0 = jnp.argmin(d2, axis=2)                      # (B, M)
    nn1 = jnp.argmin(d2, axis=1)                      # (B, N)
    min0 = jnp.min(d2, axis=2)
    min1 = jnp.min(d2, axis=1)
    mutual = jnp.take_along_axis(nn1, nn0, 1) == jnp.arange(M)[None]
    is_match = mutual & (min0 <= pos_th ** 2) & mask0
    gt0 = jnp.where(is_match, nn0, -1).astype(jnp.int32)
    unm0 = mask0 & (min0 > neg_th ** 2)
    unm1 = mask1 & (min1 > neg_th ** 2)
    return gt0, unm0, unm1


def assignment_nll(scores: Array, gt0: Array, unm0: Array,
                   unm1: Array) -> Array:
    """LightGlue loss (paper eq. 10) on one log-assignment matrix.

    scores (B, M+1, N+1); gt0 (B, M) GT column per row (-1 = none);
    unm0/unm1 flag GT-unmatchable points. Matched-pair NLL is averaged
    over matches, dustbin NLL over unmatchable points (each half
    weight), guarded against empty sets."""
    B, Mp1, Np1 = scores.shape
    M, N = Mp1 - 1, Np1 - 1
    matched = gt0 >= 0
    pick = jnp.take_along_axis(
        scores[:, :M, :], jnp.maximum(gt0, 0)[..., None], axis=2)[..., 0]
    n_m = jnp.maximum(jnp.sum(matched), 1)
    l_match = -jnp.sum(jnp.where(matched, pick, 0.0)) / n_m
    n_u0 = jnp.maximum(jnp.sum(unm0), 1)
    n_u1 = jnp.maximum(jnp.sum(unm1), 1)
    l_un0 = -jnp.sum(jnp.where(unm0, scores[:, :M, N], 0.0)) / n_u0
    l_un1 = -jnp.sum(jnp.where(unm1, scores[:, M, :N], 0.0)) / n_u1
    return l_match + 0.5 * (l_un0 + l_un1)


# -- forward with per-layer heads ----------------------------------------------

def forward_all_layers(model: LightGlue, params: dict, data: dict):
    """Run the transformer, returning per-layer descriptor states.

    Returns (d0_layers (L, B, M, D), d1_layers (L, B, N, D)) — the
    states AFTER each layer, ready for the per-layer assignment and
    confidence heads.

    Attention goes through the XLA path explicitly: the Pallas flash
    kernel used by inference has no VJP, so reverse-mode AD through it
    fails on TPU. XLA's fused attention fwd+bwd is the right training
    kernel at these sequence lengths anyway."""
    from icepy4d_tpu.ops.attention import _xla_attention
    kpts0 = normalize_keypoints(data["kpts0"], data.get("size0"))
    kpts1 = normalize_keypoints(data["kpts1"], data.get("size1"))
    mask0, mask1 = data["mask0"], data["mask1"]
    d0 = _linear(params["input_proj"], data["desc0"].astype(jnp.float32))
    d1 = _linear(params["input_proj"], data["desc1"].astype(jnp.float32))
    enc0 = rotary_encoding(params["posenc"], kpts0)
    enc1 = rotary_encoding(params["posenc"], kpts1)
    nh = model.num_heads
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])

    def body(carry, layer):
        c0, c1 = carry
        c0 = self_block(layer["self_attn"], c0, enc0, mask0, nh,
                        attn=_xla_attention)
        c1 = self_block(layer["self_attn"], c1, enc1, mask1, nh,
                        attn=_xla_attention)
        c0, c1 = cross_block(layer["cross_attn"], c0, c1, mask0, mask1,
                             nh, attn=_xla_attention)
        return (c0, c1), (c0, c1)

    _, (d0s, d1s) = jax.lax.scan(body, (d0, d1), stacked)
    return d0s, d1s


def make_train_step(model: LightGlue, tx, conf_weight: float = 0.25,
                    pos_th: float = 3.0, neg_th: float = 6.0,
                    explicit_gt: bool = False):
    """Jitted train_step(params, opt_state, batch) -> (params,
    opt_state, metrics). batch = dict(kpts0, desc0, mask0, kpts1,
    desc1, mask1, size0, size1) plus either H (homography supervision,
    the default) or — with explicit_gt=True — precomputed gt0 / unm0 /
    unm1 arrays (pipeline-verified real correspondences, where no
    homography exists)."""

    def loss_fn(params, batch):
        with jax.default_matmul_precision(model.precision):
            return _loss(params, batch)

    def _loss(params, batch):
        if explicit_gt:
            gt0 = batch["gt0"]
            unm0, unm1 = batch["unm0"], batch["unm1"]
        else:
            gt0, unm0, unm1 = gt_assignment(
                batch["kpts0"], batch["kpts1"], batch["H"],
                batch["mask0"], batch["mask1"], pos_th, neg_th)
        data = dict(batch)
        d0s, d1s = forward_all_layers(model, params, data)
        mask0, mask1 = batch["mask0"], batch["mask1"]

        assign_stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *params["assign"])
        scores_l = jax.vmap(
            lambda p, a, b: match_assignment(p, a, b, mask0, mask1)
        )(assign_stacked, d0s, d1s)                    # (L, B, M+1, N+1)
        nll_l = jax.vmap(
            lambda s: assignment_nll(s, gt0, unm0, unm1))(scores_l)
        l_assign = jnp.mean(nll_l)

        # confidence heads: predict per-point agreement with the FINAL
        # layer (paper §3.3). stop_gradient: auxiliary heads must not
        # steer the matcher features.
        m0_l, _, _, _ = jax.vmap(
            lambda s: filter_matches(s, 0.0))(scores_l)  # (L, B, M)
        final = m0_l[-1]
        conf_stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs), *params["confidence"])
        L = len(params["layers"])

        def conf_ce(p, d0, d1, m0):
            tgt0 = (m0 == final).astype(jnp.float32)
            z0 = _linear(p["token"], jax.lax.stop_gradient(d0))[..., 0]
            ce0 = sigmoid_ce(z0, tgt0)
            return jnp.sum(jnp.where(mask0, ce0, 0.0)) / jnp.maximum(
                jnp.sum(mask0), 1)

        l_conf = jnp.mean(jax.vmap(conf_ce)(
            conf_stacked, d0s[:L - 1], d1s[:L - 1], m0_l[:L - 1]))

        loss = l_assign + conf_weight * l_conf
        n_gt = jnp.sum(gt0 >= 0)
        final_valid = jnp.where(mask0, final, -1)
        hit = (final_valid == gt0) & (gt0 >= 0)
        recall = jnp.sum(hit) / jnp.maximum(n_gt, 1)
        return loss, {"loss": loss, "assign": l_assign, "conf": l_conf,
                      "n_gt": n_gt, "recall_gt": recall}

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    return train_step


def sigmoid_ce(logits: Array, labels: Array) -> Array:
    """Numerically-stable sigmoid binary cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


# -- data ------------------------------------------------------------------

def _photometric(rng, img: np.ndarray) -> np.ndarray:
    """Brightness/contrast/noise jitter so descriptors cannot key on
    absolute intensity (the pair views of a glacier differ in
    illumination far more than in geometry)."""
    out = img * rng.uniform(0.6, 1.4) + rng.uniform(-0.15, 0.15)
    if rng.uniform() < 0.5:
        import cv2

        out = cv2.GaussianBlur(out, (0, 0), rng.uniform(0.3, 1.0))
    out = out + rng.normal(0, rng.uniform(0.005, 0.03), out.shape)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def make_lightglue_dataset(
    rng,
    extract_fn,
    n_batches: int,
    batch: int,
    h: int = 240,
    w: int = 320,
    real_pool=None,
    real_fraction: float = 0.7,
    warp_strength: float = 0.22,
    extract_chunk: int = 64,
):
    """Cached training set of keypoint/descriptor pair batches.

    extract_fn(images (K, h, w)) -> dict(keypoints, descriptors,
    scores, mask) — typically the self-trained SuperPoint's extract
    bound to its params. Images are (real patch | synthetic canvas)
    + an independent photometric jitter per view; view 1 is a random
    homography warp of view 0. Returns a pytree of stacked numpy
    arrays with leading axis n_batches, ready for device_put."""
    import cv2

    from icepy4d_tpu.training.synthetic import (random_homography,
                                                synthetic_sample)

    n_pairs = n_batches * batch
    imgs0 = np.empty((n_pairs, h, w), np.float32)
    imgs1 = np.empty((n_pairs, h, w), np.float32)
    Hs = np.empty((n_pairs, 3, 3), np.float32)
    for i in range(n_pairs):
        use_real = real_pool is not None and rng.uniform() < real_fraction
        if use_real:
            src = real_pool[int(rng.integers(len(real_pool)))]
            sh, sw = src.shape
            if sh < h or sw < w:
                src = cv2.resize(src, (max(sw, w), max(sh, h)))
                sh, sw = src.shape
            y0 = int(rng.integers(0, sh - h + 1))
            x0 = int(rng.integers(0, sw - w + 1))
            base = src[y0:y0 + h, x0:x0 + w].astype(np.float32)
        else:
            base, _ = synthetic_sample(rng, h, w)
        H = random_homography(rng, h, w, strength=warp_strength)
        warped = cv2.warpPerspective(base, H, (w, h),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_REFLECT)
        imgs0[i] = _photometric(rng, base)
        imgs1[i] = _photometric(rng, warped)
        Hs[i] = H

    # one batched extraction pass per chunk (device round-trips are
    # expensive; chunk size bounds device memory)
    def extract_all(imgs):
        outs = []
        for s in range(0, n_pairs, extract_chunk):
            out = extract_fn(jnp.asarray(imgs[s:s + extract_chunk]))
            outs.append({k: np.asarray(v) for k, v in out.items()})
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    f0 = extract_all(imgs0)
    f1 = extract_all(imgs1)
    size = np.tile(np.asarray([w, h], np.float32), (n_pairs, 1))
    ds = {
        "kpts0": f0["keypoints"], "desc0": f0["descriptors"],
        "mask0": f0["mask"], "size0": size,
        "kpts1": f1["keypoints"], "desc1": f1["descriptors"],
        "mask1": f1["mask"], "size1": size,
        "H": Hs,
    }
    return {k: v.reshape(n_batches, batch, *v.shape[1:])
            for k, v in ds.items()}


def collect_epoch_pairs(results_dir, cams: tuple[str, str] | None = None,
                        min_corr: int = 50, image_scale: float = 1.0,
                        statuses: tuple[str, ...] = ("ok", "degraded")):
    """Verified wide-baseline correspondences from a season's epoch
    checkpoints (pipeline results_dir with epochs/*/*.pickle).

    The 4D pipeline's per-epoch features carry shared track_ids across
    cameras; the intersection IS the geometrically-verified
    correspondence set (GV + reprojection-filtered + BA-weighted).
    Returns a list of dicts {img0, img1 (H, W) float32 in [0,1],
    corr0, corr1 (n, 2) xy} ready for make_correspondence_dataset —
    the supervision self_training.md's MegaDepth-stage replacement
    needs, with no extra annotation."""
    import cv2

    from icepy4d_tpu.core.epoch import Epoch

    pairs = []
    root = Path(results_dir)
    for p in sorted(root.glob("epochs/*/*.pickle")):
        ep = Epoch.read_pickle(p)
        if ep.quality.get("status", "ok") not in statuses:
            continue
        names = sorted(ep.features)
        if cams is not None:
            names = [c for c in cams if c in ep.features]
        if len(names) < 2:
            continue
        c0, c1 = names[:2]
        f0, f1 = ep.features[c0], ep.features[c1]
        t0 = f0.track_ids_to_numpy()
        t1 = f1.track_ids_to_numpy()
        common, i0, i1 = np.intersect1d(t0, t1, return_indices=True)
        if len(common) < min_corr:
            continue
        xy0 = f0.kpts_to_numpy()[i0]
        xy1 = f1.kpts_to_numpy()[i1]
        imgs = {}
        for cam in (c0, c1):
            path = getattr(ep.images.get(cam), "path", None)
            if path is None or not Path(path).exists():
                imgs = None
                break
            g = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
            if image_scale != 1.0:
                # INTER_AREA: the 4x default downscale aliases badly
                # under INTER_LINEAR
                g = cv2.resize(g, (int(round(g.shape[1] * image_scale)),
                                   int(round(g.shape[0] * image_scale))),
                               interpolation=cv2.INTER_AREA)
            imgs[cam] = g.astype(np.float32) / 255.0
        if imgs is None:
            continue

        def rescale(xy):
            # cv2 pixel-center convention: source x maps to
            # (x + 0.5) * s - 0.5, not x * s (0.375 px bias at s=0.25)
            return ((xy + 0.5) * image_scale - 0.5).astype(np.float32)

        pairs.append({
            "img0": imgs[c0], "img1": imgs[c1],
            "corr0": rescale(xy0), "corr1": rescale(xy1),
        })
    return pairs


def make_correspondence_dataset(
    rng,
    describe_fn,
    detect_fn,
    pairs: list,
    n_batches: int,
    batch: int,
    n_kpts: int = 512,
    pos_fraction: float = 0.5,
    neg_margin: float = 6.0,
):
    """Explicit-GT training batches from verified real correspondences.

    describe_fn(images (1, H, W), kpts (1, K, 2)) -> (1, K, D)
    descriptors at given positions (SuperPoint.describe_at bound to
    params); detect_fn(images (1, H, W)) -> extract() dict, supplying
    detected keypoints used as unmatchable negatives. Each sample draws
    a random subset of one pair's correspondences into the first slots
    (gt = identity pairing, independently permuted per side is
    unnecessary — the matcher sees only coordinates/descriptors) and
    fills the rest with detections; detections within neg_margin px of
    a used correspondence are supervised as neither matched nor
    unmatchable (their true status is unknown). All shapes static:
    (n_batches, batch, n_kpts, ...)."""
    n_samples = n_batches * batch
    # per-pair device work ONCE: full detection + a descriptor pass over
    # all its correspondences (samples then just gather host-side)
    per_pair = []
    for pr in pairs:
        entry = {}
        for side in (0, 1):
            img = pr[f"img{side}"]
            h, w = img.shape
            corr = np.asarray(pr[f"corr{side}"], np.float32)
            desc = np.asarray(describe_fn(
                jnp.asarray(img[None]), jnp.asarray(corr[None])))[0]
            det = detect_fn(jnp.asarray(img[None]))
            entry[side] = {
                "size": np.asarray([w, h], np.float32),
                "corr": corr, "corr_desc": desc,
                "det_xy": np.asarray(det["keypoints"])[0],
                "det_desc": np.asarray(det["descriptors"])[0],
                "det_mask": np.asarray(det["mask"])[0],
            }
        per_pair.append(entry)

    out = {k: [] for k in ("kpts0", "desc0", "mask0", "size0",
                           "kpts1", "desc1", "mask1", "size1",
                           "gt0", "unm0", "unm1")}
    d_dim = per_pair[0][0]["corr_desc"].shape[-1]
    n_pos_max = int(n_kpts * pos_fraction)
    for _ in range(n_samples):
        entry = per_pair[int(rng.integers(len(per_pair)))]
        n_corr = len(entry[0]["corr"])
        n_pos = min(n_corr, n_pos_max)
        sel = rng.choice(n_corr, size=n_pos, replace=False)
        sample = {}
        for side in (0, 1):
            e = entry[side]
            kpts = np.zeros((n_kpts, 2), np.float32)
            desc = np.zeros((n_kpts, d_dim), np.float32)
            mask = np.zeros((n_kpts,), bool)
            kpts[:n_pos] = e["corr"][sel]
            desc[:n_pos] = e["corr_desc"][sel]
            mask[:n_pos] = True
            # negatives: valid detections, shuffled
            dv = np.flatnonzero(e["det_mask"])
            rng.shuffle(dv)
            n_neg = min(len(dv), n_kpts - n_pos)
            kpts[n_pos:n_pos + n_neg] = e["det_xy"][dv[:n_neg]]
            desc[n_pos:n_pos + n_neg] = e["det_desc"][dv[:n_neg]]
            mask[n_pos:n_pos + n_neg] = True
            # a detection near ANY tracked correspondence (selected or
            # not) has a real partner in the other view -> unknown
            # status, never dustbin-supervised (comparing only against
            # the sampled subset would push true matches into the
            # dustbin whenever n_corr >> n_pos)
            unm = np.zeros((n_kpts,), bool)
            if n_neg:
                d2 = np.sum((kpts[n_pos:n_pos + n_neg, None, :]
                             - e["corr"][None, :, :]) ** 2, -1)
                near = d2.min(1) < neg_margin ** 2
                unm[n_pos:n_pos + n_neg] = ~near
            sample[side] = (kpts, desc, mask, unm, e["size"])
        gt0 = np.full((n_kpts,), -1, np.int32)
        gt0[:n_pos] = np.arange(n_pos)
        out["kpts0"].append(sample[0][0])
        out["desc0"].append(sample[0][1])
        out["mask0"].append(sample[0][2])
        out["unm0"].append(sample[0][3])
        out["size0"].append(sample[0][4])
        out["kpts1"].append(sample[1][0])
        out["desc1"].append(sample[1][1])
        out["mask1"].append(sample[1][2])
        out["unm1"].append(sample[1][3])
        out["size1"].append(sample[1][4])
        out["gt0"].append(gt0)
    stacked = {k: np.stack(v) for k, v in out.items()}
    return {k: v.reshape(n_batches, batch, *v.shape[1:])
            for k, v in stacked.items()}


def homography_to_explicit(ds: dict, pos_th: float = 3.0,
                           neg_th: float = 6.0) -> dict:
    """Convert a homography-supervised dataset (make_lightglue_dataset)
    to the explicit-GT format, so it can be concatenated with real
    correspondence batches (make_correspondence_dataset) for mixed
    training — the homography half regularizes a small-season
    fine-tune against memorizing its few real pairs.

    One jitted dispatch: eager per-op execution through a remote-TPU
    tunnel costs ~0.1-1 s per op (and the pairwise-distance tensor is
    large), while the inputs/outputs here are small numpy arrays."""
    gt0, unm0, unm1 = jax.tree.map(np.asarray, jax.jit(
        gt_assignment, static_argnums=(5, 6))(
        jnp.asarray(ds["kpts0"].reshape(-1, *ds["kpts0"].shape[2:])),
        jnp.asarray(ds["kpts1"].reshape(-1, *ds["kpts1"].shape[2:])),
        jnp.asarray(ds["H"].reshape(-1, 3, 3)),
        jnp.asarray(ds["mask0"].reshape(-1, ds["mask0"].shape[-1])),
        jnp.asarray(ds["mask1"].reshape(-1, ds["mask1"].shape[-1])),
        pos_th, neg_th))
    nb, b = ds["H"].shape[:2]
    out = {k: v for k, v in ds.items() if k != "H"}
    out["gt0"] = gt0.reshape(nb, b, -1)
    out["unm0"] = unm0.reshape(nb, b, -1)
    out["unm1"] = unm1.reshape(nb, b, -1)
    return out


def train_lightglue(
    model: LightGlue,
    dataset: dict,
    steps: int = 3000,
    lr: float = 1e-4,
    seed: int = 0,
    params: dict | None = None,
    scan_chunk: int = 100,
    conf_weight: float = 0.25,
    warmup: int = 200,
    log=print,
    save_fn=None,
    save_every: int = 0,
):
    """Train `model` on a cached dataset (make_lightglue_dataset).

    Same dispatch discipline as superpoint_train.train_superpoint: the
    dataset lives on device, scan_chunk optimizer steps run per
    dispatch. Cosine LR with linear warmup. Returns (params, history).

    save_fn(params, step) is called every `save_every` steps (rounded
    to chunk boundaries) so an interrupted multi-hour run keeps its
    progress (runs through the remote-TPU tunnel die with the session).
    """
    import optax

    n_batches = next(iter(dataset.values())).shape[0]
    explicit_gt = "gt0" in dataset
    if params is None:
        params = model.init(seed)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(steps, warmup + 1), lr * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, conf_weight,
                              explicit_gt=explicit_gt)
    data = jax.device_put(jax.tree.map(jnp.asarray, dataset))

    @partial(jax.jit, static_argnames=("n_steps",))
    def run_chunk(params, opt_state, data, start, n_steps):
        def body(carry, k):
            params, opt_state = carry
            i = (start + k) % n_batches
            batch = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, 0, keepdims=False), data)
            params, opt_state, metrics = step_fn(params, opt_state, batch)
            return (params, opt_state), (metrics["loss"],
                                         metrics["recall_gt"])

        (params, opt_state), (losses, recalls) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, losses, recalls

    history = []
    done = 0
    last_save = 0
    while done < steps:
        n = min(scan_chunk, steps - done)
        params, opt_state, losses, recalls = run_chunk(
            params, opt_state, data, jnp.asarray(done), n)
        losses = np.asarray(losses)
        recalls = np.asarray(recalls)
        history.append({"step": done + n - 1,
                        "loss": float(losses[-1]),
                        "chunk_mean": float(losses.mean()),
                        "recall_gt": float(recalls[-1])})
        log(f"step {done + n - 1:6d}  loss {losses[-1]:.4f}  "
            f"(chunk mean {losses.mean():.4f})  "
            f"GT recall {recalls[-1]:.3f}")
        done += n
        if save_fn is not None and save_every and \
                done - last_save >= save_every and done < steps:
            save_fn(params, done)
            last_save = done
    return params, history


def evaluate_matching(model: LightGlue, params: dict, dataset: dict,
                      n_batches: int | None = None,
                      filter_threshold: float | None = None):
    """Held-out precision/recall of mutual-max matches vs GT (from the
    dataset's homography, or its explicit gt0 when present).

    filter_threshold overrides the model's confidence filter for this
    evaluation (None = use the model's own; models hash by config, so
    the override gets its own jit cache entry)."""
    if filter_threshold is not None and \
            filter_threshold != model.filter_threshold:
        import copy

        model = copy.copy(model)
        model.filter_threshold = float(filter_threshold)
    B = (next(iter(dataset.values())).shape[0]
         if n_batches is None else n_batches)
    tp = fp = n_gt = fp_labeled = 0
    has_unm = "unm0" in dataset
    for i in range(B):
        batch = jax.tree.map(lambda a: jnp.asarray(a[i]), dataset)
        out = model.match(params, {k: batch[k] for k in (
            "kpts0", "desc0", "mask0", "size0",
            "kpts1", "desc1", "mask1", "size1")})
        if "gt0" in batch:
            gt0 = batch["gt0"]
        else:
            gt0, _, _ = gt_assignment(batch["kpts0"], batch["kpts1"],
                                      batch["H"], batch["mask0"],
                                      batch["mask1"])
        m0 = np.asarray(out["matches0"])
        g = np.asarray(gt0)
        pred = m0 >= 0
        wrong = pred & (m0 != g)
        tp += int(((m0 == g) & pred & (g >= 0)).sum())
        fp += int(wrong.sum())
        n_gt += int((g >= 0).sum())
        if has_unm:
            # rows with UNKNOWN status (not GT-matched, not verified
            # unmatchable) cannot be judged; exclude them from the
            # labeled precision (they still count in raw precision)
            known = (g >= 0) | np.asarray(batch["unm0"])
            fp_labeled += int((wrong & known).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(n_gt, 1)
    out_d = {"precision": precision, "recall": recall,
             "n_gt": n_gt, "n_pred": tp + fp}
    if has_unm:
        out_d["precision_labeled"] = tp / max(tp + fp_labeled, 1)
    return out_d
