"""Self-training for the ALIKED-style extractor (models/aliked.py).

Same offline recipe as the other bundled checkpoints (no downloads):
synthetic shapes with known corner labels bootstrap the score map, and
homography-related pairs (synthetic + real glacier patches,
training/synthetic.py) supervise descriptors and score repeatability.
Published ALIKED trains with differentiable reprojection + matching
losses on MegaDepth; offline we substitute the known-homography
correspondence signal, which the in-house SuperPoint self-training
already validated end-to-end (training/superpoint_train.py).

Losses per homography pair (H maps image-A pixels to image-B pixels):
  * detection BCE: binary corner heatmap from the synthetic 65-way cell
    labels (real patches carry no labels -> weight 0);
  * repeatability: MSE between score_A at detected peaks and score_B at
    the warped positions (in-bounds masked);
  * descriptor InfoNCE: SDDH descriptors at the top-K peaks of A vs at
    the warped positions in B; symmetric cross-entropy over the K-way
    similarity matrix (temperature tau).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def warp_points(kpts: Array, H: Array) -> Array:
    """(K, 2) xy pixels through a 3x3 homography."""
    ones = jnp.ones((kpts.shape[0], 1), kpts.dtype)
    p = jnp.concatenate([kpts, ones], -1) @ H.T
    return p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) < 1e-9, 1e-9, p[:, 2:])


def labels_to_heatmap(labels: Array, h: int, w: int) -> Array:
    """65-way cell labels (B, h/8, w/8) -> binary corner map (B, h, w).

    Label semantics follow training/synthetic.py::corners_to_cells:
    64 = no corner, else dy*8+dx within the cell."""
    b, hc, wc = labels.shape
    onehot = jax.nn.one_hot(labels, 65)[..., :64]          # (B,hc,wc,64)
    grid = onehot.reshape(b, hc, wc, 8, 8)
    grid = grid.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
    return grid[:, :h, :w]


def _detect_peaks(score: Array, k: int, nms_radius: int) -> tuple[Array, Array]:
    """Static top-K NMS peaks of (B, H, W) -> (kpts (B,K,2) xy, valid)."""
    from icepy4d_tpu.models.superpoint import _topk_peaks, simple_nms

    heat = simple_nms(score, nms_radius)
    b, h, w = score.shape
    border = ((jnp.arange(h) < 8) | (jnp.arange(h) >= h - 8))[:, None] | \
             ((jnp.arange(w) < 8) | (jnp.arange(w) >= w - 8))[None, :]
    heat = jnp.where(border[None], 0.0, heat)
    sc, kpts = _topk_peaks(heat, k, nms_radius)
    return kpts, sc > 0.0


def make_train_step(model, tx, n_peaks: int = 128, tau: float = 0.07,
                    det_weight: float = 1.0, rep_weight: float = 1.0,
                    desc_weight: float = 1.0):
    """Returns train_step(params, opt_state, imgs, warped, Hs, labels,
    det_w) -> (params, opt_state, loss). det_w (B,) zeroes the
    detection BCE for unlabeled (real-patch) pairs."""

    def pair_desc(params, feat, kpts):
        from icepy4d_tpu.models.aliked import SDDH

        sddh = SDDH(model.descriptor_dim, model.n_samples, model.patch,
                    model.offset_radius, model.dtype)
        sp = {"params": params["params"]["sddh"]}
        return jax.vmap(lambda f, kp: sddh.apply(sp, f, kp))(feat, kpts)

    def loss_fn(params, imgs, warped, Hs, labels, det_w):
        b, h, w = imgs.shape
        sA, fA = model.net.apply(params, imgs[..., None], mode="dense")
        sB, fB = model.net.apply(params, warped[..., None], mode="dense")

        # --- detection BCE on the synthetic corner heatmap ---
        y = labels_to_heatmap(labels, h, w)
        pos_w = (h * w) / jnp.maximum(y.sum((1, 2), keepdims=True), 1.0)
        eps = 1e-6
        bce = -(pos_w * y * jnp.log(sA + eps)
                + (1.0 - y) * jnp.log(1.0 - sA + eps))
        l_det = jnp.mean(det_w[:, None, None] * bce)

        # --- peaks of A (positions are supervision anchors, not
        # gradient paths) ---
        kA, vA = _detect_peaks(jax.lax.stop_gradient(sA),
                               n_peaks, model.nms_radius)
        kB = jax.vmap(warp_points)(kA, Hs)                  # (B,K,2)
        inb = (kB[..., 0] >= 8) & (kB[..., 0] < w - 8) & \
              (kB[..., 1] >= 8) & (kB[..., 1] < h - 8) & vA

        # --- repeatability: score agreement at corresponding points ---
        from icepy4d_tpu.ops.image import bilinear_sample

        def at(s1, kp):
            return bilinear_sample(s1[..., None], kp)[..., 0]

        rep = (jax.vmap(at)(sA, kA) - jax.vmap(at)(sB, kB)) ** 2
        l_rep = jnp.sum(rep * inb) / jnp.maximum(jnp.sum(inb), 1.0)

        # --- descriptor InfoNCE over the K-way in-pair similarities ---
        dA = pair_desc(params, fA, kA)                      # (B,K,D)
        dB = pair_desc(params, fB, kB)
        sim = jnp.einsum("bkd,bld->bkl", dA, dB) / tau
        neg_inf = -1e9
        simm = jnp.where(inb[:, None, :], sim, neg_inf)
        simm = jnp.where(inb[:, :, None], simm, neg_inf)
        diag = jnp.arange(n_peaks)
        logp_ab = jax.nn.log_softmax(simm, axis=-1)[:, diag, diag]
        logp_ba = jax.nn.log_softmax(simm, axis=-2)[:, diag, diag]
        nce = -(logp_ab + logp_ba) * 0.5
        l_desc = jnp.sum(nce * inb) / jnp.maximum(jnp.sum(inb), 1.0)

        return (det_weight * l_det + rep_weight * l_rep
                + desc_weight * l_desc)

    @jax.jit
    def train_step(params, opt_state, imgs, warped, Hs, labels, det_w):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, imgs, warped, Hs, labels, det_w)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train_aliked(
    model,
    params,
    steps: int = 2000,
    batch: int = 16,
    h: int = 240,
    w: int = 320,
    lr: float = 3e-4,
    seed: int = 0,
    n_batches: int = 64,
    real_pool=None,
    real_fraction: float = 0.5,
    scan_chunk: int = 100,
    log=print,
):
    """Cached-batch training loop (device-resident batches + lax.scan
    chunks like training/lightglue_train.py::train_lightglue — eager
    per-step dispatch through the remote-TPU tunnel would dominate)."""
    import optax

    from icepy4d_tpu.training.synthetic import (make_pair_batch,
                                                make_real_pair_batch)

    rng = np.random.default_rng(seed)
    data = {"imgs": [], "warped": [], "Hs": [], "labels": [], "detw": []}
    for i in range(n_batches):
        if real_pool is not None and rng.uniform() < real_fraction:
            imgs, warped, Hs, labels = make_real_pair_batch(
                rng, real_pool, batch, h, w)
            detw = np.zeros(batch, np.float32)
        else:
            imgs, warped, Hs, labels = make_pair_batch(rng, batch, h, w)
            detw = np.ones(batch, np.float32)
        for k, v in zip(data, (imgs, warped, Hs, labels, detw)):
            data[k].append(v)
    data = {k: jnp.asarray(np.stack(v)) for k, v in data.items()}

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps)))
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx)

    def run_chunk(params, opt_state, start, n_steps):
        def body(carry, k):
            p, s = carry
            i = (start + k) % n_batches
            p, s, loss = step_fn(p, s, data["imgs"][i], data["warped"][i],
                                 data["Hs"][i], data["labels"][i],
                                 data["detw"][i])
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            lambda c, k: body(c, k), (params, opt_state),
            jnp.arange(n_steps))
        return params, opt_state, losses

    # scan_chunk <= 1: eager per-step dispatch over the device-resident
    # batches. The scan-wrapped chunk program is what the remote-TPU
    # compile service cannot digest (r5: >55 min then 'broken pipe'
    # at any chunk size, while the BARE train step compiles in 58 s and
    # warm steps run in ~12 ms) — with async dispatch the eager loop is
    # within noise of the scan on the tunnel anyway.
    if scan_chunk <= 1:
        for k in range(steps):
            i = k % n_batches
            params, opt_state, loss = step_fn(
                params, opt_state, data["imgs"][i], data["warped"][i],
                data["Hs"][i], data["labels"][i], data["detw"][i])
            if (k + 1) % 100 == 0 or k + 1 == steps:
                log(f"step {k + 1}/{steps} loss {float(loss):.4f}")
        return params

    run_chunk = jax.jit(run_chunk, static_argnums=(3,))
    done = 0
    while done < steps:
        n = min(scan_chunk, steps - done)
        params, opt_state, losses = run_chunk(params, opt_state, done, n)
        done += n
        log(f"step {done}/{steps} loss {float(losses.mean()):.4f}")
    return params
