"""SuperPoint detector/descriptor, TPU-native.

Re-design of the vendored torch SuperPoint
(ref thirdparty/SuperGlue/models/superpoint.py:100-219 and
thirdparty/LightGlue/lightglue/superpoint.py:90-231):

  VGG encoder 4x(conv3x3,conv3x3,pool) 64/64/128/128 ch
  detector head convPa/convPb -> 65ch softmax -> 8x8 pixel shuffle
  simple_nms (radius 4) -> threshold 0.005 -> border removal -> top-K
  descriptor head convDa/convDb -> 256-d, bilinear sample at kpts, L2 norm

TPU-first differences from the reference:
  * NHWC layout, bfloat16-friendly convs, batched over tiles/pairs —
    a whole tile grid is ONE forward on the MXU instead of the
    reference's per-tile python loop (ref matching/matchers.py:367).
  * static shapes end-to-end: always returns exactly `max_keypoints`
    rows per image with a validity mask (score>threshold and not
    suppressed); downstream kernels consume the mask.
  * NMS via reduce_window max-pooling (identical semantics to torch
    simple_nms with 2 refinement iterations).

Parameter layout is checkpoint-compatible: `convert.load_torch_superpoint`
maps the official `superpoint_v1.pth` onto these params.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _s2d_tap_table() -> "np.ndarray":
    """Static 0/1 tensor routing a 3x3 conv's taps onto the
    space-to-depth form: M[cy,cx,p,q,dy,dx] = 1 iff, for output phase
    q = di*2+dj of cell (i,j), the tap (dy-1, dx-1) of the full-res
    3x3 kernel reads input phase p = py*2+px of cell
    (i+cy-1, j+cx-1)."""
    import numpy as np

    M = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for cy in range(3):
        for cx in range(3):
            for py in range(2):
                for px in range(2):
                    for di in range(2):
                        for dj in range(2):
                            dy = 2 * (cy - 1) + py - di
                            dx = 2 * (cx - 1) + px - dj
                            if -1 <= dy <= 1 and -1 <= dx <= 1:
                                M[cy, cx, py * 2 + px, di * 2 + dj,
                                  dy + 1, dx + 1] = 1.0
    return M


def _space_to_depth(x: Array) -> Array:
    """(B, H, W, 1) -> (B, H/2, W/2, 4) with phase order py*2+px."""
    b, h, w, _ = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2).transpose(0, 1, 3, 2, 4)
    return xs.reshape(b, h // 2, w // 2, 4)


class _S2DConv3x3(nn.Module):
    """Full-resolution 3x3 conv computed in space-to-depth form.

    A direct 1-channel conv runs at <1 TFLOP/s on the MXU (measured
    36 ms of the 85 ms full-res trunk): the systolic array needs a
    contraction dimension. Folding 2x2 pixels into 4 phase channels
    and scattering the 9 taps into an equivalent (3,3,4*Cin,4*Cout)
    kernel is bit-equivalent math (zero padding included; each routed
    entry maps exactly one tap, no re-summation). Input AND output stay
    in s2d layout (B, H/2, W/2, 4*C with phase-major channel order) —
    round-tripping 24-MP activations through pixel layout costs two
    materialized multi-GB transposes (the round-3 full-res HBM OOM) and
    is pure waste when the next op is another full-res conv or the 2x2
    max pool (a phase-max in this layout). Param layout is identical to
    nn.Conv (kernel (3,3,Cin,Cout), bias (Cout,)) so torch checkpoints
    load unchanged. The FLOP cost is 4x the pixel-space conv (the 3x3
    cell window spans a 6x6-px receptive field, three-quarters routed
    zeros) — MXU cycles traded for never touching full-res HBM, a win
    at 24 MP (measured; see bench device_step)."""

    cin: int
    cout: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Array) -> Array:
        ci, co = self.cin, self.cout
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ci, co))
        bias = self.param("bias", nn.initializers.zeros, (co,))
        # W[cy,cx, p*ci+i, q*co+c]: exactly one (dy,dx) tap routes to
        # each slot, so this is placement, not accumulation
        Wk = jnp.einsum("abpqyx,yxic->abpiqc",
                        jnp.asarray(_s2d_tap_table()),
                        kernel.astype(jnp.float32))
        Wk = Wk.reshape(3, 3, 4 * ci, 4 * co).astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), Wk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + jnp.tile(bias, 4).astype(self.dtype)


def _phase_max(x: Array) -> Array:
    """2x2/stride-2 max pool of an s2d-layout tensor: the four phases
    of a cell ARE its 2x2 full-res block, so the pool is a channel-
    group max — no spatial reshuffle at all."""
    b, h2, w2, c4 = x.shape
    return x.reshape(b, h2, w2, 4, c4 // 4).max(3)


def _max_pool2(x: Array) -> Array:
    """2x2/stride-2 max pool via reshape-max (reduce_window measured
    25 ms on the full-res 64-ch map; this is a plain strided reduce).
    Even H, W required (guaranteed by the 8-px input padding)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max((2, 4))


class SuperPointNet(nn.Module):
    """The raw CNN: gray (B,H,W,1) -> (scores (B,H,W), dense_desc (B,H/8,W/8,256)).

    H and W must be multiples of 8.
    """

    channels: tuple = (64, 64, 128, 128)
    descriptor_dim: int = 256
    nms_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, raw: bool = False) -> tuple[Array, Array]:
        conv = partial(nn.Conv, kernel_size=(3, 3), padding=1, dtype=self.dtype)
        c1, c2, c3, c4 = self.channels
        x = x.astype(self.dtype)
        # full-res stage entirely in space-to-depth layout: conv1a ->
        # conv1b -> pool1 without ever materializing a (B, H, W, 64)
        # tensor (at 24 MP that tensor is 5.7 GB f32 and its layout
        # shuffles OOM'd the 16-GB chip)
        x = _space_to_depth(x)
        x = nn.relu(_S2DConv3x3(1, c1, self.dtype, name="conv1a")(x))
        x = nn.relu(_S2DConv3x3(c1, c1, self.dtype, name="conv1b")(x))
        x = _phase_max(x)
        x = nn.relu(conv(c2, name="conv2a")(x))
        x = nn.relu(conv(c2, name="conv2b")(x))
        x = _max_pool2(x)
        x = nn.relu(conv(c3, name="conv3a")(x))
        x = nn.relu(conv(c3, name="conv3b")(x))
        x = _max_pool2(x)
        x = nn.relu(conv(c4, name="conv4a")(x))
        x = nn.relu(conv(c4, name="conv4b")(x))

        # detector head: 65 = 8*8 cells + dustbin
        cpa = nn.relu(conv(256, name="convPa")(x))
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(cpa)
        if raw:
            # training surface: 65-way cell logits + normalized dense
            # descriptors (training/superpoint_train.py)
            cda_r = nn.relu(conv(256, name="convDa")(x))
            desc_r = nn.Conv(self.descriptor_dim, (1, 1), dtype=self.dtype,
                             name="convDb")(cda_r).astype(jnp.float32)
            desc_r = desc_r / jnp.maximum(
                jnp.linalg.norm(desc_r, axis=-1, keepdims=True), 1e-12)
            return logits.astype(jnp.float32), desc_r
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        b, hc, wc, _ = probs.shape
        # pixel shuffle 8x8: cell channels -> pixels
        heat = probs.reshape(b, hc, wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        # descriptor head
        cda = nn.relu(conv(256, name="convDa")(x))
        desc = nn.Conv(self.descriptor_dim, (1, 1), dtype=self.dtype,
                       name="convDb")(cda)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return heat, desc


def simple_nms(scores: Array, nms_radius: int = 4) -> Array:
    """Fast NMS by max-pooling, 2 suppression-refinement iterations.

    Exact port of semantics at ref SuperGlue/models/superpoint.py:32-50.
    scores: (B, H, W).
    """
    size = 2 * nms_radius + 1

    def max_pool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, size, size), (1, 1, 1), "SAME")

    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.astype(jnp.float32)) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def _topk_peaks(heat: Array, max_keypoints: int,
                nms_radius: int) -> tuple[Array, Array]:
    """Exact top-K of an NMS-suppressed heatmap, TPU-fast.

    `jax.lax.top_k` over the full B x H*W map is a sort over ~6M
    elements at full res — one of the hottest non-conv ops in
    extraction. After radius-r NMS, surviving peaks are > r apart
    (Chebyshev), so every (r, r) cell holds AT MOST ONE nonzero: a
    cell max-pool + in-cell argmax loses nothing, and top_k runs on a
    r*r-times smaller grid. Returns (scores (B,K), kpts (B,K,2) xy).

    Exact-score ties are the one semantic difference: simple_nms keeps
    BOTH members of an exact tie within the suppression window, and if
    the two share a cell only the argmax survivor is returned (the old
    full top_k returned both). Real heatmaps tie only on suppressed
    zeros. The cell path is used only when it preserves the output
    capacity K = min(max_keypoints, h*w) (callers pad/bucket on it).
    """
    from icepy4d_tpu.ops.topk import safe_top_k

    b, h, w = heat.shape
    c = max(nms_radius, 1)
    k = min(max_keypoints, h * w)
    if h % c or w % c or (h // c) * (w // c) < k:
        scores, idx = safe_top_k(heat.reshape(b, -1), k)
        yy = (idx // w).astype(jnp.float32)
        xx = (idx % w).astype(jnp.float32)
        return scores, jnp.stack([xx, yy], -1)
    hc, wc = h // c, w // c
    cells = heat.reshape(b, hc, c, wc, c).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(b, hc * wc, c * c)
    cell_max = jnp.max(cells, -1)                      # (B, hc*wc)
    cell_arg = jnp.argmax(cells, -1).astype(jnp.int32)
    scores, idx = safe_top_k(cell_max, k)              # (B, K)
    sub = jnp.take_along_axis(cell_arg, idx, 1)
    yy = ((idx // wc) * c + sub // c).astype(jnp.float32)
    xx = ((idx % wc) * c + sub % c).astype(jnp.float32)
    return scores, jnp.stack([xx, yy], -1)


def sample_descriptors(dense_desc: Array, kpts: Array, s: int = 8) -> Array:
    """Bilinear-sample dense descriptors at pixel keypoints + L2 normalize.

    dense_desc: (Hc, Wc, D); kpts: (K, 2) pixel coords in the full image.
    Matches torch grid_sample(align_corners=False) coordinate transform
    (ref SuperGlue/models/superpoint.py:53-67).
    """
    hc, wc, d = dense_desc.shape
    # exact torch transform: kp' = (kp - s/2 + 0.5) / (wc*s - s/2 - 0.5),
    # grid_sample(align_corners=True) => x_desc = kp' * (wc - 1)
    scale = jnp.array([wc * s - s / 2 - 0.5, hc * s - s / 2 - 0.5], jnp.float32)
    span = jnp.array([wc - 1, hc - 1], jnp.float32)
    xy = (kpts - s / 2 + 0.5) / scale * span
    from icepy4d_tpu.ops.image import bilinear_sample

    desc = bilinear_sample(dense_desc, xy)
    return desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)


class SuperPoint:
    """User-facing extractor with static top-K output.

    extract(params, images) -> dict with
      keypoints (B,K,2) float32 [x,y] pixels
      scores    (B,K)   float32
      descriptors (B,K,256) float32 L2-normalized
      mask      (B,K)   bool  (valid = above threshold, not border)
    """

    def __init__(
        self,
        max_keypoints: int = 2048,
        detection_threshold: float = 0.005,
        nms_radius: int = 4,
        remove_borders: int = 4,
        descriptor_dim: int = 256,
        dtype: jnp.dtype = jnp.float32,
        precision: str = "default",
    ):
        self.max_keypoints = int(max_keypoints)
        self.detection_threshold = float(detection_threshold)
        self.nms_radius = int(nms_radius)
        self.remove_borders = int(remove_borders)
        self.descriptor_dim = int(descriptor_dim)
        # "default" = single-pass bf16 MXU matmuls/convs (fast path);
        # parity tests construct with "highest" to match torch f32.
        # dtype = ACTIVATION dtype of the conv trunk: bfloat16 halves
        # the HBM traffic of the (bandwidth-bound) full-res layers —
        # the measured extract MFU roughly doubles; the NMS/top-k/
        # descriptor-sampling epilogue always runs f32 (cast below).
        self.precision = precision
        self.dtype = dtype
        self.net = SuperPointNet(descriptor_dim=descriptor_dim, dtype=dtype)

    def _use_pallas_nms(self, h: int) -> bool:
        from icepy4d_tpu.ops.pallas_nms import pallas_nms_available

        return (jax.default_backend() == "tpu"
                and pallas_nms_available(h, self.nms_radius))

    # hash/eq by configuration: jit caches (self is a static argnum)
    # survive across instances with the same settings
    def _key(self):
        return (type(self), self.max_keypoints, self.detection_threshold,
                self.nms_radius, self.remove_borders,
                self.descriptor_dim, self.precision,
                jnp.dtype(self.dtype).name)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, SuperPoint) and self._key() == other._key()

    def init(self, rng, h: int = 64, w: int = 64):
        # jit the whole init: eagerly it dispatches hundreds of tiny ops,
        # which is very slow over a remote-TPU tunnel
        return jax.jit(self.net.init)(
            rng, jnp.zeros((1, h, w, 1), jnp.float32))

    def extract_flops(self, h: int, w: int, batch: int = 1) -> float:
        """Analytic EXECUTED matmul FLOPs of one extract() forward
        (2*Cin*Cout*k^2 per conv output element; elementwise/NMS/top-k
        excluded, ~2% by XLA's own count — pinned against the compiled
        cost analysis in tests/test_flops.py). The full-res conv1a/b run
        in space-to-depth form, which executes 4x the pixel-space MACs
        (three-quarters routed zeros, see _S2DConv3x3) — counted as
        executed, so the derived MFU measures real MXU occupancy. Used
        when the remote backend cannot serve a cost analysis."""
        c1, c2, c3, c4 = self.net.channels
        dd = self.descriptor_dim
        a = float(h * w)
        per_px = (
            4 * (2 * 1 * c1 * 9 + 2 * c1 * c1 * 9)     # s2d conv1a/b
            + (2 * c1 * c2 * 9 + 2 * c2 * c2 * 9) / 4  # conv2a/b, H/2
            + (2 * c2 * c3 * 9 + 2 * c3 * c3 * 9) / 16  # conv3a/b, H/4
            + (2 * c3 * c4 * 9 + 2 * c4 * c4 * 9) / 64  # conv4a/b, H/8
            + (2 * c4 * 256 * 9 + 2 * 256 * 65) / 64    # convPa/Pb
            + (2 * c4 * 256 * 9 + 2 * 256 * dd) / 64    # convDa/Db
        )
        return batch * a * per_px

    @partial(jax.jit, static_argnums=0)
    def extract(self, params, images: Array) -> dict:
        """images: (B, H, W) or (B, H, W, 1) grayscale in [0, 1].

        Arbitrary H, W: inputs are padded to the 8-px cell grid and the
        padded band is masked out like a border.
        """
        with jax.default_matmul_precision(self.precision):
            return self._extract(params, images)

    @partial(jax.jit, static_argnums=0)
    def describe_at(self, params, images: Array, kpts: Array) -> Array:
        """Descriptors at GIVEN pixel positions (no detection).

        images (B, H, W[, 1]) in [0, 1]; kpts (B, K, 2) xy pixels.
        Returns (B, K, 256) L2-normalized descriptors bilinearly sampled
        from the dense map — the sampling path real keypoints take in
        extract(). Used to attach matcher-input descriptors to
        externally-supplied correspondences (e.g. the SIFT+GCP
        pipeline's verified wide-baseline matches feeding
        training/lightglue_train.make_correspondence_dataset)."""
        with jax.default_matmul_precision(self.precision):
            if images.ndim == 3:
                images = images[..., None]
            b, h0, w0, _ = images.shape
            ph, pw = (-h0) % 8, (-w0) % 8
            if ph or pw:
                images = jnp.pad(images,
                                 ((0, 0), (0, ph), (0, pw), (0, 0)))
            _, dense_desc = self.net.apply(params, images)
            dense_desc = dense_desc.astype(jnp.float32)
            return jax.vmap(sample_descriptors)(dense_desc, kpts)

    def _extract(self, params, images: Array) -> dict:
        if images.ndim == 3:
            images = images[..., None]
        b, h0, w0, _ = images.shape
        ph, pw = (-h0) % 8, (-w0) % 8
        if ph or pw:
            images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        b, h, w, _ = images.shape
        heat, dense_desc = self.net.apply(params, images)
        # epilogue (NMS ranking, top-k, bilinear descriptor sampling)
        # stays f32 regardless of the trunk activation dtype
        heat = heat.astype(jnp.float32)
        dense_desc = dense_desc.astype(jnp.float32)

        # NMS + border removal (ref superpoint.py:32-60); original image
        # edge (not the padded one) counts as the border. On TPU the
        # whole suppression chain runs as ONE fused Pallas pass
        # (ops/pallas_nms.py) instead of ~11 HBM round-trips.
        r = max(self.remove_borders, 1)
        if self._use_pallas_nms(h):
            from icepy4d_tpu.ops.pallas_nms import fused_nms_border

            heat = fused_nms_border(heat, self.nms_radius, r, h0, w0)
        else:
            heat = simple_nms(heat, self.nms_radius)
            ys = jnp.arange(h)
            xs = jnp.arange(w)
            border = ((ys < r) | (ys >= h0 - r))[:, None] | \
                     ((xs < r) | (xs >= w0 - r))[None, :]
            heat = jnp.where(border[None], 0.0, heat)

        scores, kpts = _topk_peaks(heat, self.max_keypoints,
                                   self.nms_radius)
        mask = scores > self.detection_threshold

        desc = jax.vmap(sample_descriptors, in_axes=(0, 0))(dense_desc, kpts)
        return {
            "keypoints": kpts,
            "scores": jnp.where(mask, scores, 0.0),
            "descriptors": jnp.where(mask[..., None], desc, 0.0),
            "mask": mask,
        }


def superpoint_init(rng=None, **kwargs) -> tuple[SuperPoint, dict]:
    """Build a SuperPoint and params (random unless a checkpoint is loaded
    afterwards via models.convert.load_torch_superpoint)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = SuperPoint(**kwargs)
    return model, model.init(rng)
