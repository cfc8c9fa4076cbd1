"""DISK detector/descriptor (flax), 128-d.

Fills the role of the reference's DISK extractor
(thirdparty/LightGlue/lightglue/disk.py:8-77, a kornia wrapper): a thin
U-Net producing a dense 128-d descriptor field plus a detection heatmap
(Tyszkiewicz et al., "DISK: Learning local features with policy
gradient", NeurIPS 2020). Architecture follows the paper's thin U-Net
(5x5 conv blocks, average-pool down, nearest-neighbor up, PReLU gates,
instance norm); kornia is not available offline, so checkpoint-name
conversion is deferred until the exact torch module layout can be
verified — the extractor runs with its own (random or self-trained)
parameters and shares SuperPoint's inference surface (top-k + NMS).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from icepy4d_tpu.models.superpoint import simple_nms
from icepy4d_tpu.ops.image import bilinear_sample

Array = jax.Array


class ConvBlock(nn.Module):
    """5x5 conv -> instance norm -> PReLU (paper's thin block)."""

    features: int
    size: int = 5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, (self.size, self.size),
                    padding="SAME")(x)
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        alpha = self.param("prelu", lambda k: jnp.full((1,), 0.25))
        return jnp.where(x >= 0, x, alpha * x)


class DISKNet(nn.Module):
    """Thin U-Net: down [16,32,64,64,64], up [64,64,64], head 128+1."""

    down: tuple = (16, 32, 64, 64, 64)
    up: tuple = (64, 64, 64)
    descriptor_dim: int = 128

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        skips = []
        for i, ch in enumerate(self.down):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(ch)(x)
            skips.append(x)
        for i, ch in enumerate(self.up):
            skip = skips[-(i + 2)]
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[3]),
                method="nearest")
            x = ConvBlock(ch)(jnp.concatenate([x, skip], -1))
        # final level back to full resolution + linear head (desc + heat)
        skip = skips[0]
        x = jax.image.resize(
            x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[3]),
            method="nearest")
        x = jnp.concatenate([x, skip], -1)
        x = nn.Conv(self.descriptor_dim + 1, (1, 1))(x)
        desc = x[..., : self.descriptor_dim]
        heat = x[..., self.descriptor_dim]
        return heat, desc


class DISK:
    """Top-k DISK extractor with SuperPoint's inference surface.

    extract(params, images (B,H,W[,1]) in [0,1]) -> dict(keypoints
    (B,K,2), scores (B,K), descriptors (B,K,128) L2-normalized,
    mask (B,K)).
    """

    def __init__(
        self,
        max_keypoints: int = 2048,
        nms_radius: int = 2,
        detection_threshold: float = 0.0,
        descriptor_dim: int = 128,
    ):
        self.max_keypoints = int(max_keypoints)
        self.nms_radius = int(nms_radius)
        self.detection_threshold = float(detection_threshold)
        self.descriptor_dim = int(descriptor_dim)
        self.net = DISKNet(descriptor_dim=descriptor_dim)

    def _key(self):
        return (type(self), self.max_keypoints, self.nms_radius,
                self.detection_threshold, self.descriptor_dim)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, DISK) and self._key() == other._key()

    def init(self, rng, h: int = 64, w: int = 64):
        return jax.jit(self.net.init)(
            rng, jnp.zeros((1, h, w, 1), jnp.float32))

    @partial(jax.jit, static_argnums=0)
    def extract(self, params, images: Array) -> dict:
        if images.ndim == 3:
            images = images[..., None]
        b, h0, w0, _ = images.shape
        ph, pw = (-h0) % 16, (-w0) % 16
        if ph or pw:
            images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        heat, desc = self.net.apply(params, images)
        heat = jax.nn.sigmoid(heat)
        heat = simple_nms(heat, self.nms_radius)
        h, w = heat.shape[1:3]
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        border = ((ys < 2) | (ys >= h0 - 2))[:, None] | \
                 ((xs < 2) | (xs >= w0 - 2))[None, :]
        heat = jnp.where(border[None], 0.0, heat)

        k = min(self.max_keypoints, h * w)
        flat = heat.reshape(b, -1)
        scores, idx = jax.lax.top_k(flat, k)
        kpts = jnp.stack([(idx % w).astype(jnp.float32),
                          (idx // w).astype(jnp.float32)], -1)
        mask = scores > self.detection_threshold

        d = jax.vmap(bilinear_sample)(desc, kpts)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-12)
        return {
            "keypoints": kpts,
            "scores": jnp.where(mask, scores, 0.0),
            "descriptors": jnp.where(mask[..., None], d, 0.0),
            "mask": mask,
        }


def disk_init(rng=None, **kwargs) -> tuple[DISK, dict]:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = DISK(**kwargs)
    return model, model.init(rng)
