"""DISK detector/descriptor, original architecture, TPU-native.

Fills the role of the reference's DISK extractor
(ref thirdparty/LightGlue/lightglue/disk.py:8-77, a kornia wrapper).
Architecture follows the original DISK thin U-Net (Tyszkiewicz et al.,
"DISK: Learning local features with policy gradient", NeurIPS 2020;
kornia.feature.DISK ports it verbatim):

  input: RGB (3 channels)
  down path  [16, 32, 64, 64, 64]   (first block at full res, then
                                     2x2 average-pool before each)
  up path    [64, 64, 64, 129]      (nearest 2x upsample, concat skip)
  conv block: pre-activation 5x5 — InstanceNorm (no affine) -> PReLU
              (per-channel) -> Conv(bias); the FIRST down block is a
              bare conv (no norm/gate on raw pixels)
  head: channels [0:128] dense descriptors, channel [128] heatmap

Inference (kornia DISK.forward semantics): 5x5 local-max NMS on the
heatmap, score threshold, top-n keypoints; descriptors sampled at the
keypoint pixel and L2-normalized; scores are raw heatmap values.

TPU-first: static top-k keypoint capacity with validity masks (kornia
returns ragged lists), one fused jitted forward per image batch.

Checkpoint conversion: models.convert.disk_params_from_torch walks the
torch state dict structurally (per-block conv kernels/biases + PReLU
slopes in path order), so it tolerates naming differences between
kornia releases; tests/oracle_disk.py pins numeric parity against a
torch replica of the same architecture.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DOWN_DIMS = (16, 32, 64, 64, 64)
UP_DIMS = (64, 64, 64, 129)


def _conv5(p: dict, x: Array) -> Array:
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _norm_gate(p: dict, x: Array) -> Array:
    """InstanceNorm2d (affine=False, torch eps) then per-channel PReLU."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return jnp.where(x >= 0, x, p["alpha"] * x)


def unet_apply(params: dict, x: Array) -> Array:
    """Thin U-Net forward. x (B, H, W, 3), H/W divisible by 16 ->
    (B, H, W, 129)."""
    skips = []
    for i, blk in enumerate(params["down"]):
        if i > 0:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
            x = _conv5(blk, _norm_gate(blk, x))
        else:
            x = _conv5(blk, x)      # first block: bare conv
        skips.append(x)
    for i, blk in enumerate(params["up"]):
        skip = skips[-(i + 2)]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        x = jnp.concatenate([x, skip], -1)
        x = _conv5(blk, _norm_gate(blk, x))
    return x


def nms_window_mask(heat: Array, window: int) -> Array:
    """True where heat equals the max over a window x window
    neighborhood (kornia heatmap_to_keypoints local-max NMS)."""
    pad = window // 2
    local_max = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, window, window),
        (1, 1, 1), [(0, 0), (pad, pad), (pad, pad)])
    return heat == local_max


class DISK:
    """Static-capacity DISK extractor.

    extract(params, images) -> dict(keypoints (B,K,2) [x,y] px, scores
    (B,K) raw heatmap values, descriptors (B,K,128) L2-normalized,
    mask (B,K)). Accepts (B,H,W) grayscale (replicated to RGB) or
    (B,H,W,3).
    """

    def __init__(
        self,
        max_keypoints: int = 2048,
        nms_window_size: int = 5,
        detection_threshold: float = 0.0,
        descriptor_dim: int = 128,
        nms_radius: int | None = None,  # alias used by matcher plumbing
    ):
        self.max_keypoints = int(max_keypoints)
        self.nms_window_size = int(
            2 * nms_radius + 1 if nms_radius else nms_window_size)
        self.detection_threshold = float(detection_threshold)
        self.descriptor_dim = int(descriptor_dim)

    def _key(self):
        return (type(self), self.max_keypoints, self.nms_window_size,
                self.detection_threshold, self.descriptor_dim)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, DISK) and self._key() == other._key()

    def init(self, rng=None, h: int = 64, w: int = 64) -> dict:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rngs = iter(jax.random.split(rng, 64))

        def block(cin, cout):
            fan = 25 * cin
            return {
                "w": jax.random.normal(
                    next(rngs), (5, 5, cin, cout)) / np.sqrt(fan),
                "b": jnp.zeros((cout,)),
                "alpha": jnp.full((cin,), 0.25),
            }

        down = []
        cin = 3
        for c in DOWN_DIMS:
            down.append(block(cin, c))
            cin = c
        up = []
        bot = DOWN_DIMS[-1]
        for skip, c in zip(DOWN_DIMS[-2::-1], UP_DIMS):
            up.append(block(bot + skip, c))
            bot = c
        down[0].pop("alpha")  # first block has no gate
        return {"down": down, "up": up}

    @partial(jax.jit, static_argnums=0)
    def extract(self, params, images: Array) -> dict:
        if images.ndim == 3:
            images = images[..., None]
        if images.shape[-1] == 1:
            images = jnp.broadcast_to(
                images, images.shape[:-1] + (3,))
        b, h0, w0, _ = images.shape
        ph, pw = (-h0) % 16, (-w0) % 16
        if ph or pw:
            images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        out = unet_apply(params, images)
        desc = out[..., : self.descriptor_dim]
        heat = out[..., self.descriptor_dim]

        keep = nms_window_mask(heat, self.nms_window_size)
        h, w = heat.shape[1:3]
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        inside = (ys < h0)[:, None] & (xs < w0)[None, :]
        score = jnp.where(keep & inside[None]
                          & (heat > self.detection_threshold),
                          heat, -jnp.inf)

        k = min(self.max_keypoints, h * w)
        flat = score.reshape(b, -1)
        from icepy4d_tpu.ops.topk import safe_top_k

        scores, idx = safe_top_k(flat, k)
        mask = jnp.isfinite(scores)
        kpts = jnp.stack([(idx % w).astype(jnp.float32),
                          (idx // w).astype(jnp.float32)], -1)

        d = jnp.take_along_axis(
            desc.reshape(b, -1, self.descriptor_dim), idx[..., None], 1)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-12)
        return {
            "keypoints": jnp.where(mask[..., None], kpts, 0.0),
            "scores": jnp.where(mask, scores, 0.0),
            "descriptors": jnp.where(mask[..., None], d, 0.0),
            "mask": mask,
        }


def disk_init(rng=None, **kwargs) -> tuple[DISK, dict]:
    model = DISK(**kwargs)
    return model, model.init(rng)
