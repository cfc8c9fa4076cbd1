"""ALIKED-style extractor: multi-scale backbone + deformable descriptors.

Model-zoo extension (no reference counterpart: franioli/icepy4d ships
SuperPoint/DISK wrappers only — ref src/icepy4d/matching/matchers.py
imports, thirdparty/LightGlue/lightglue/aliked.py does not exist there).
Follows the published design of ALIKED (Zhao et al., "ALIKED: A Lighter
Keypoint and Descriptor Extraction Network via Deformable
Transformation", IEEE TIM 2023) in spirit, not checkpoint layout:

  * 4-stage conv backbone (1, 1/2, 1/4, 1/8 resolution), every stage
    1x1-projected and upsampled to full resolution, concatenated into
    one dense feature map;
  * score-map head + differentiable keypoint detection (NMS, static
    top-K, local soft-argmax subpixel refinement);
  * sparse deformable descriptor head (SDDH): per keypoint, a small
    head predicts M sample offsets + mixing weights from the local
    feature patch; the descriptor is the weighted sum of the feature
    map bilinearly sampled at keypoint+offsets, projected and
    L2-normalized. Descriptor compute is O(keypoints), not O(pixels) —
    the paper's core saving — and every gather here is a batched
    static-shape bilinear sample.

Since official ALIKED checkpoints cannot be downloaded in this
environment and the exact layer shapes of the released .pth files are
not reproducible offline, this module does NOT claim checkpoint
compatibility (unlike models/superpoint.py); it is self-trainable with
training/aliked_train.py on the same synthetic-homography supervision
as the other bundled checkpoints.

Interface-compatible with SuperPoint.extract:
extract(params, images[B,H,W]) -> {keypoints, descriptors, scores,
mask} padded to max_keypoints.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _l2_normalize(x: Array, eps: float = 1e-12) -> Array:
    """L2 normalize with a gradient defined at x == 0.

    `x / max(norm(x), eps)` is NaN-unsafe in reverse mode: sqrt'(0) is
    inf and the zero cotangent from `maximum` gives 0 * inf = NaN. An
    exactly-zero x happens in training whenever a warped keypoint lands
    fully out of bounds (all SDDH samples pad to 0, proj bias inits 0).
    """
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


class _ConvBlock(nn.Module):
    """conv3x3-SELU x2 with a residual path (1x1-projected on channel
    change). SELU keeps activations self-normalizing without the
    batch-statistics dependence torch ALIKED avoids too."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = partial(nn.Conv, kernel_size=(3, 3), padding=1,
                       dtype=self.dtype)
        y = nn.selu(conv(self.features, name="c1")(x))
        y = conv(self.features, name="c2")(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        name="proj")(x)
        return nn.selu(x + y)


def _avg_pool2(x: Array) -> Array:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean((2, 4))


class ALIKEDNet(nn.Module):
    """Backbone + heads: gray (B,H,W,1) -> (score (B,H,W),
    feature map (B,H,W,dim) L2-normalized). H, W divisible by 8."""

    channels: tuple = (16, 32, 64, 128)
    dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        c1, c2, c3, c4 = self.channels
        x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        f1 = _ConvBlock(c1, self.dtype, name="block1")(x)
        f2 = _ConvBlock(c2, self.dtype, name="block2")(_avg_pool2(f1))
        f3 = _ConvBlock(c3, self.dtype, name="block3")(_avg_pool2(f2))
        f4 = _ConvBlock(c4, self.dtype, name="block4")(_avg_pool2(f3))

        # aggregate: 1x1 -> dim/4 each, upsample to full res, concat
        q = self.dim // 4
        outs = []
        for i, f in enumerate((f1, f2, f3, f4)):
            g = nn.Conv(q, (1, 1), dtype=self.dtype, name=f"agg{i + 1}")(f)
            if g.shape[1] != h:
                g = jax.image.resize(g, (b, h, w, q), "bilinear")
            outs.append(g)
        feat = nn.selu(jnp.concatenate(outs, -1))          # (B,H,W,dim)

        # score-map head
        s = nn.selu(nn.Conv(8, (1, 1), dtype=self.dtype,
                            name="score1")(feat))
        s = nn.selu(nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                            name="score2")(s))
        s = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                    name="score3")(s)
        score = jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]

        feat = feat.astype(jnp.float32)
        return score, _l2_normalize(feat)


class SDDH(nn.Module):
    """Sparse deformable descriptor head.

    Per keypoint: a 2-layer MLP over the flattened K x K local feature
    patch predicts M (dy, dx) offsets (tanh-bounded to +-radius) and M
    softmax mixing weights; the descriptor is the mixed bilinear
    sample of the feature map at keypoint+offsets, then a linear
    projection + L2 norm.
    """

    dim: int = 128
    n_samples: int = 16      # M
    patch: int = 5           # K
    radius: float = 6.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: Array, kpts: Array) -> Array:
        """feat (H,W,D) normalized feature map; kpts (K,2) xy px (may be
        subpixel). Returns (K, dim) L2-normalized descriptors."""
        from icepy4d_tpu.ops.image import bilinear_sample

        k = kpts.shape[0]
        p, m = self.patch, self.n_samples
        r = (p - 1) / 2.0
        dy, dx = jnp.meshgrid(jnp.linspace(-r, r, p),
                              jnp.linspace(-r, r, p), indexing="ij")
        grid = jnp.stack([dx.ravel(), dy.ravel()], -1)     # (p*p, 2) xy
        patch_xy = kpts[:, None, :] + grid[None]           # (K, p*p, 2)
        patches = bilinear_sample(feat, patch_xy.reshape(-1, 2))
        patches = patches.reshape(k, p * p * feat.shape[-1])

        hdim = 2 * self.dim
        hid = nn.selu(nn.Dense(hdim, dtype=self.dtype,
                               name="off1")(patches.astype(self.dtype)))
        raw = nn.Dense(3 * m, dtype=self.dtype,
                       name="off2")(hid).astype(jnp.float32)
        offs = jnp.tanh(raw[:, : 2 * m].reshape(k, m, 2)) * self.radius
        wgt = jax.nn.softmax(raw[:, 2 * m:], axis=-1)      # (K, M)

        samp_xy = kpts[:, None, :] + offs                  # (K, M, 2)
        samples = bilinear_sample(feat, samp_xy.reshape(-1, 2))
        samples = samples.reshape(k, m, feat.shape[-1])
        mixed = jnp.einsum("km,kmd->kd", wgt, samples)
        desc = nn.Dense(self.dim, dtype=self.dtype,
                        name="proj")(mixed.astype(self.dtype))
        return _l2_normalize(desc.astype(jnp.float32))


class _ALIKEDApply(nn.Module):
    """Single flax module binding backbone + SDDH for one param tree."""

    channels: tuple
    dim: int
    n_samples: int
    patch: int
    radius: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, images: Array, kpts: Array | None = None,
                 mode: str = "dense"):
        net = ALIKEDNet(self.channels, self.dim, self.dtype, name="net")
        score, feat = net(images)
        if mode == "dense":
            return score, feat
        sddh = SDDH(self.dim, self.n_samples, self.patch, self.radius,
                    self.dtype, name="sddh")
        desc = jax.vmap(sddh)(feat, kpts)
        return score, desc


class ALIKED:
    """User-facing extractor with static top-K output (house interface:
    models/superpoint.py::SuperPoint)."""

    def __init__(
        self,
        max_keypoints: int = 2048,
        detection_threshold: float = 0.2,
        nms_radius: int = 2,
        remove_borders: int = 8,
        channels: tuple = (16, 32, 64, 128),
        descriptor_dim: int = 128,
        n_samples: int = 16,
        patch: int = 5,
        offset_radius: float = 6.0,
        dtype: jnp.dtype = jnp.float32,
        precision: str = "default",
    ):
        self.max_keypoints = int(max_keypoints)
        self.detection_threshold = float(detection_threshold)
        self.nms_radius = int(nms_radius)
        self.remove_borders = int(remove_borders)
        self.channels = tuple(int(c) for c in channels)
        self.descriptor_dim = int(descriptor_dim)
        self.n_samples = int(n_samples)
        self.patch = int(patch)
        self.offset_radius = float(offset_radius)
        self.dtype = dtype
        self.precision = precision
        self.net = _ALIKEDApply(self.channels, self.descriptor_dim,
                                self.n_samples, self.patch,
                                self.offset_radius, dtype)

    def _key(self):
        return (type(self), self.max_keypoints, self.detection_threshold,
                self.nms_radius, self.remove_borders, self.channels,
                self.descriptor_dim, self.n_samples, self.patch,
                self.offset_radius, self.precision,
                jnp.dtype(self.dtype).name)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, ALIKED) and self._key() == other._key()

    def init(self, rng, h: int = 64, w: int = 64) -> dict:
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        kpts = jnp.zeros((1, 4, 2), jnp.float32)
        return jax.jit(partial(self.net.init, mode="sparse"))(
            rng, jnp.zeros((1, h, w, 1), jnp.float32), kpts)

    @partial(jax.jit, static_argnums=0)
    def extract(self, params, images: Array) -> dict:
        """images (B,H,W[,1]) grayscale in [0,1] -> padded feature dict.

        Arbitrary H, W (padded to the 8-px grid internally); keypoint
        coords are subpixel (local 3x3 soft-argmax like the paper's DKD).
        """
        with jax.default_matmul_precision(self.precision):
            return self._extract(params, images)

    def _extract(self, params, images: Array) -> dict:
        from icepy4d_tpu.models.superpoint import _topk_peaks, simple_nms

        if images.ndim == 3:
            images = images[..., None]
        b, h0, w0, _ = images.shape
        ph, pw = (-h0) % 8, (-w0) % 8
        if ph or pw:
            images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        b, h, w, _ = images.shape
        score, feat = self.net.apply(params, images, mode="dense")

        heat = simple_nms(score, self.nms_radius)
        r = max(self.remove_borders, 1)
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        border = ((ys < r) | (ys >= h0 - r))[:, None] | \
                 ((xs < r) | (xs >= w0 - r))[None, :]
        heat = jnp.where(border[None], 0.0, heat)
        scores, kpts = _topk_peaks(heat, self.max_keypoints,
                                   self.nms_radius)
        mask = scores > self.detection_threshold

        # DKD subpixel: soft-argmax of the raw score in the 3x3
        # neighborhood of each integer peak
        xi = kpts[..., 0].astype(jnp.int32)
        yi = kpts[..., 1].astype(jnp.int32)
        dyx = jnp.stack(jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2),
                                     indexing="ij"), -1).reshape(9, 2)

        def neigh(s1, y1, x1):
            yy = jnp.clip(y1[:, None] + dyx[None, :, 0], 0, h - 1)
            xx = jnp.clip(x1[:, None] + dyx[None, :, 1], 0, w - 1)
            return s1[yy, xx]                               # (K, 9)

        nv = jax.vmap(neigh)(score, yi, xi)
        sm = jax.nn.softmax(nv * 10.0, axis=-1)
        off_y = jnp.einsum("bkn,n->bk", sm, dyx[:, 0].astype(jnp.float32))
        off_x = jnp.einsum("bkn,n->bk", sm, dyx[:, 1].astype(jnp.float32))
        kpts = kpts + jnp.stack([off_x, off_y], -1)

        sddh = SDDH(self.descriptor_dim, self.n_samples, self.patch,
                    self.offset_radius, self.dtype)
        sddh_params = {"params": params["params"]["sddh"]}
        desc = jax.vmap(lambda f, kp: sddh.apply(sddh_params, f, kp))(
            feat, kpts)
        return {
            "keypoints": kpts,
            "scores": jnp.where(mask, scores, 0.0),
            "descriptors": jnp.where(mask[..., None], desc, 0.0),
            "mask": mask,
        }


def aliked_init(rng=None, **kwargs) -> tuple[ALIKED, dict]:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = ALIKED(**kwargs)
    return model, model.init(rng)
