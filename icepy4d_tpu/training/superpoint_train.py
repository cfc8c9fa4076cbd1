"""Self-training SuperPoint on synthetic geometry (MagicPoint stage).

Reproduces the published bootstrap (DeTone et al. 2018 §5): the
detector head learns the 65-way cell classification against rendered
ground-truth corners, and the descriptor head learns a hinge loss over
cell correspondences induced by random homographies — giving this
repository a usable checkpoint WITHOUT downloading the official
weights (impossible offline). Quality is below the homographic-
adaptation-refined original on natural images, but detection becomes
real: corners of rendered and real structured scenes are found with
high recall (tests/test_training.py).

The train step is one jitted program (forward both views, CE +
hinge, adam update); data generation streams from the host
(training/synthetic.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def detector_loss(logits: Array, labels: Array,
                  pos_weight: float = 8.0) -> Array:
    """65-way cell cross-entropy; corner cells up-weighted (the dustbin
    dominates the grid)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.where(labels < 64, pos_weight, 1.0)
    return -jnp.sum(w * ll) / jnp.sum(w)


def _cell_centers(hc: int, wc: int) -> np.ndarray:
    ys, xs = np.mgrid[0:hc, 0:wc]
    return np.stack([xs * 8 + 4, ys * 8 + 4],
                    -1).reshape(-1, 2).astype(np.float32)


def descriptor_loss(dA: Array, dB: Array, H: Array, hc: int, wc: int,
                    pos_margin: float = 1.0, neg_margin: float = 0.2,
                    lambda_d: float = 250.0) -> Array:
    """SuperPoint hinge loss over cell correspondences of one pair.

    dA/dB (hc*wc, 256) L2-normalized; H maps image-A pixels to B."""
    centers = jnp.asarray(_cell_centers(hc, wc))          # (L, 2)
    ones = jnp.ones((centers.shape[0], 1), centers.dtype)
    pA = jnp.concatenate([centers, ones], -1) @ H.T        # (L, 3)
    pA = pA[:, :2] / jnp.where(jnp.abs(pA[:, 2:]) < 1e-9, 1e-9,
                               pA[:, 2:])
    d2 = jnp.sum(
        (pA[:, None, :] - centers[None, :, :]) ** 2, -1)   # (L, L)
    s = (d2 <= 64.0).astype(dA.dtype)                      # within 8 px
    sim = dA @ dB.T
    pos = s * jnp.maximum(0.0, pos_margin - sim)
    neg = (1.0 - s) * jnp.maximum(0.0, sim - neg_margin)
    l = lambda_d * pos + neg
    return jnp.mean(l)


def make_train_step(net, tx, desc_weight: float = 1.0):
    """Returns jitted train_step(params, opt_state, imgs, warped, Hs,
    labels[, det_w]) -> (params, opt_state, metrics).

    det_w (scalar, default 1.0) masks the detector loss per batch:
    REAL-image descriptor batches carry no corner labels, and their
    all-dustbin placeholders must not teach "no corners on real
    imagery"."""

    def loss_fn(params, imgs, warped, Hs, labels, det_w):
        # training runs bf16 MXU matmuls (the package pins "highest"
        # globally for geometry; conv fwd+bwd dominates the step and
        # bf16 multiplies are standard practice for this stage)
        with jax.default_matmul_precision("default"):
            return _loss(params, imgs, warped, Hs, labels, det_w)

    def _loss(params, imgs, warped, Hs, labels, det_w):
        logitsA, descA = net.apply(params, imgs[..., None], raw=True)
        logitsB, descB = net.apply(params, warped[..., None], raw=True)
        l_det = det_w * detector_loss(logitsA, labels)
        hc, wc = logitsA.shape[1:3]
        l_desc = jnp.mean(jax.vmap(
            lambda a, b, h: descriptor_loss(
                a.reshape(-1, a.shape[-1]),
                b.reshape(-1, b.shape[-1]), h, hc, wc)
        )(descA, descB, Hs))
        loss = l_det + desc_weight * l_desc
        return loss, {"loss": loss, "det": l_det, "desc": l_desc}

    @jax.jit
    def train_step(params, opt_state, imgs, warped, Hs, labels,
                   det_w=1.0):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, imgs, warped, Hs, labels,
                                   jnp.asarray(det_w, jnp.float32))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    return train_step


def train_superpoint(
    steps: int = 4000,
    batch: int = 32,
    h: int = 120,
    w: int = 160,
    lr: float = 1e-3,
    seed: int = 0,
    n_cached_batches: int = 256,
    desc_weight: float = 1.0,
    log_every: int = 200,
    params=None,
    scan_chunk: int = 250,
    real_image_dir=None,
    real_fraction: float = 0.5,
    real_labeled=None,
):
    """Train and return (params, history).

    TPU-idiomatic loop: the whole rendered dataset uploads ONCE and
    stays device-resident; `lax.scan` runs `scan_chunk` optimizer steps
    per dispatch (per-step host round-trips over a remote tunnel cost
    ~1 s each — three orders of magnitude more than the step's
    compute). Batches cycle through the cached set.

    real_image_dir: when given, `real_fraction` of the cached batches
    are homography-warped REAL-image patches driving the DESCRIPTOR
    loss only (det_w=0) — synthetic blobs alone collapse descriptors.
    real_labeled: optional (imgs (N,h,w), labels (N,h/8,w/8)) from
    homographic_adaptation — real batches then ALSO train the detector
    (det_w=1) on the warp-aggregated pseudo-labels (SuperPoint §6)."""
    import optax

    from icepy4d_tpu.models.superpoint import SuperPoint
    from icepy4d_tpu.training.synthetic import make_pair_batch

    rng = np.random.default_rng(seed)
    sp = SuperPoint()
    if params is None:
        params = sp.init(jax.random.PRNGKey(seed), h, w)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step_fn = make_train_step(sp.net, tx, desc_weight)

    import cv2

    from icepy4d_tpu.training.synthetic import random_homography

    def labeled_real_batch():
        imgs_l, labels_l = real_labeled
        idx = rng.integers(0, len(imgs_l), batch)
        imgs_b = imgs_l[idx]
        labels_b = labels_l[idx]
        warped_b = np.empty_like(imgs_b)
        Hs_b = np.empty((batch, 3, 3), np.float32)
        for t in range(batch):
            Hb = random_homography(rng, h, w, strength=0.1)
            warped_b[t] = cv2.warpPerspective(
                imgs_b[t], Hb, (w, h), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_REFLECT)
            Hs_b[t] = Hb
        return imgs_b, warped_b, Hs_b, labels_b

    host = []
    det_ws = []
    use_real = real_image_dir is not None or real_labeled is not None
    if real_image_dir is not None and real_labeled is None:
        from icepy4d_tpu.training.synthetic import (
            load_real_patch_pool, make_real_pair_batch)

        pool = load_real_patch_pool(real_image_dir)
    for k in range(n_cached_batches):
        is_real = use_real and rng.uniform() < real_fraction
        if is_real and real_labeled is not None:
            host.append(labeled_real_batch())
            det_ws.append(1.0)   # pseudo-labels train the detector too
        elif is_real:
            host.append(make_real_pair_batch(rng, pool, batch, h, w))
            det_ws.append(0.0)
        else:
            host.append(make_pair_batch(rng, batch, h, w))
            det_ws.append(1.0)
    data = jax.device_put(tuple(
        jnp.stack([jnp.asarray(b[i]) for b in host])
        for i in range(4)) + (jnp.asarray(det_ws, jnp.float32),))
    del host

    @partial(jax.jit, static_argnames=("n_steps",))
    def run_chunk(params, opt_state, data, start, n_steps):
        # data is an ARGUMENT: a closure over device arrays would bake
        # the whole dataset into the jaxpr as constants
        def body(carry, k):
            params, opt_state = carry
            i = (start + k) % n_cached_batches
            sel = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, 0, keepdims=False), data)
            imgs, warped, Hs, labels, det_w = sel
            params, opt_state, metrics = step_fn(
                params, opt_state, imgs, warped, Hs, labels, det_w)
            return (params, opt_state), metrics["loss"]

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, losses

    history = []
    done = 0
    while done < steps:
        n = min(scan_chunk, steps - done)
        params, opt_state, losses = run_chunk(
            params, opt_state, data, jnp.asarray(done), n)
        losses = np.asarray(losses)
        history.append({"step": done + n - 1,
                        "loss": float(losses[-1]),
                        "chunk_mean": float(losses.mean())})
        print(f"step {done + n - 1:6d}  loss {losses[-1]:.4f}  "
              f"(chunk mean {losses.mean():.4f})", flush=True)
        done += n
    return params, history


def homographic_adaptation(
    params,
    pool,
    rng,
    n_patches: int = 256,
    n_warps: int = 24,
    h: int = 120,
    w: int = 160,
    nms_radius: int = 4,
    detect_threshold: float = 0.015,
    max_corners: int = 120,
):
    """Pseudo-label real patches by warp-aggregated detection
    (SuperPoint §6 "Homographic Adaptation").

    For each real patch: run the CURRENT detector on n_warps random
    homographies of it, warp the heatmaps back, average, NMS — the
    aggregated maxima are stable interest points that become detector
    labels for the real-image training stage. Returns
    (imgs (N, h, w), labels (N, h/8, w/8))."""
    import cv2

    from icepy4d_tpu.models.superpoint import SuperPoint, simple_nms
    from icepy4d_tpu.training.synthetic import (corners_to_cells,
                                                random_homography)

    sp = SuperPoint()

    @jax.jit
    def heat_batch(params, imgs):
        heat, _ = sp.net.apply(params, imgs[..., None])
        return heat

    imgs_out = np.empty((n_patches, h, w), np.float32)
    labels_out = np.empty((n_patches, h // 8, w // 8), np.int32)
    for i in range(n_patches):
        src = pool[int(rng.integers(len(pool)))]
        sh, sw = src.shape
        y0 = int(rng.integers(0, max(sh - h, 1)))
        x0 = int(rng.integers(0, max(sw - w, 1)))
        patch = src[y0:y0 + h, x0:x0 + w]
        if patch.shape != (h, w):
            patch = cv2.resize(patch, (w, h))
        patch = patch.astype(np.float32)

        warps = [np.eye(3, dtype=np.float32)] + [
            random_homography(rng, h, w, strength=0.12)
            for _ in range(n_warps - 1)]
        warped = np.stack([
            cv2.warpPerspective(patch, H, (w, h),
                                flags=cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_REFLECT)
            for H in warps])
        heats = np.asarray(heat_batch(params, jnp.asarray(warped)))
        acc = np.zeros((h, w), np.float32)
        cnt = np.zeros((h, w), np.float32)
        for H, heat in zip(warps, heats):
            back = cv2.warpPerspective(
                heat, np.linalg.inv(H).astype(np.float32), (w, h),
                flags=cv2.INTER_LINEAR)
            m = cv2.warpPerspective(
                np.ones_like(heat), np.linalg.inv(H).astype(np.float32),
                (w, h), flags=cv2.INTER_NEAREST)
            acc += back
            cnt += m
        agg = acc / np.maximum(cnt, 1.0)
        nms = np.asarray(simple_nms(
            jnp.asarray(agg)[None], nms_radius)[0])
        ys, xs = np.where(nms > detect_threshold)
        if len(ys) > max_corners:
            top = np.argsort(nms[ys, xs])[::-1][:max_corners]
            ys, xs = ys[top], xs[top]
        corners = np.stack([xs, ys], -1).astype(np.float32) \
            if len(ys) else np.zeros((0, 2), np.float32)
        imgs_out[i] = patch
        labels_out[i] = corners_to_cells(corners, h, w)
    return imgs_out, labels_out
