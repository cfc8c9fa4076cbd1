"""LoFTR detector-free matcher, exact architecture, TPU-native.

The reference's LOFTRMatcher wraps kornia's ``KF.LoFTR`` pretrained model
(ref src/icepy4d/matching/matchers.py:1005-1199).  This module implements
the same architecture (Sun et al., "LoFTR: Detector-Free Local Feature
Matching with Transformers", CVPR 2021) natively in JAX so the published
checkpoints load through ``models.convert.loftr_params_from_torch``:

  ResNet-FPN 8-2 backbone (coarse 1/8 x 256, fine 1/2 x 128)
  sinusoidal 2-D positional encoding (incl. the original checkpoints'
    "temperature bug" mode, temp_bug_fix=False)
  coarse LocalFeatureTransformer: 4 x (self + cross) linear attention
  dual-softmax coarse matching (T=0.1) + mutual-NN + border removal
  fine stage: 5x5 windows at 1/2, coarse-feature concat, 1 x (self +
    cross) transformer, center-vs-window dual softmax, subpixel
    expectation refinement

TPU-first differences from the torch implementation:
  * everything is statically shaped: coarse matches are extracted with a
    masked top-K (``max_matches`` capacity) instead of ``nonzero``, and
    results carry validity masks;
  * the whole pair forward (backbone -> coarse match -> fine refine) is
    ONE jitted XLA program, vmapped over tile-pair batches;
  * coarse self/cross blocks run under ``lax.scan`` over stacked layer
    parameters (one compiled layer body, not 8 unrolled);
  * linear attention is a pair of einsums over (B, N, H, D) — exactly
    the O(N d^2) contraction the MXU wants, no attention matrix.

Parity: tests/test_loftr.py checks numeric agreement against a torch
replica with kornia's exact module layout (shared random weights).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BN_EPS = 1e-5
LN_EPS = 1e-5


# -- primitive layers ---------------------------------------------------------


def _conv(p: dict, x: Array, stride: int = 1, pad: int = 0) -> Array:
    """NHWC conv, explicit symmetric padding (matches torch Conv2d)."""
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p: dict, x: Array) -> Array:
    """BatchNorm, eval mode (running statistics)."""
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"]) * (inv * p["scale"]) + p["bias"]


def _linear(p: dict, x: Array) -> Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _layer_norm(p: dict, x: Array) -> Array:
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]


# -- backbone: ResNetFPN_8_2 --------------------------------------------------


def _basic_block(p: dict, x: Array, stride: int) -> Array:
    y = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, stride, 1)))
    y = _bn(p["bn2"], _conv(p["conv2"], y, 1, 1))
    if stride != 1:
        x = _bn(p["down_bn"], _conv(p["down_conv"], x, stride, 0))
    return jax.nn.relu(x + y)


def _upsample2x_align_corners(x: Array) -> Array:
    """Bilinear 2x upsample with torch align_corners=True semantics."""
    b, h, w, c = x.shape

    def lerp_axis(t: Array, n: int, axis: int) -> Array:
        src = jnp.arange(2 * n) * ((n - 1) / (2 * n - 1))
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        f = (src - i0).astype(t.dtype)
        shape = [1, 1, 1, 1]
        shape[axis] = 2 * n
        f = f.reshape(shape)
        a = jnp.take(t, i0, axis=axis)
        bb = jnp.take(t, i1, axis=axis)
        return a * (1 - f) + bb * f

    x = lerp_axis(x, h, 1)
    return lerp_axis(x, w, 2)


def backbone_apply(p: dict, x: Array) -> tuple[Array, Array]:
    """(B, H, W, 1) grayscale -> coarse (B, H/8, W/8, 256),
    fine (B, H/2, W/2, 128)."""
    x0 = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, 2, 3)))   # 1/2
    x1 = x0
    for blk in p["layer1"]:
        x1 = _basic_block(blk, x1, 1)
    x2 = _basic_block(p["layer2"][0], x1, 2)                      # 1/4
    x2 = _basic_block(p["layer2"][1], x2, 1)
    x3 = _basic_block(p["layer3"][0], x2, 2)                      # 1/8
    x3 = _basic_block(p["layer3"][1], x3, 1)

    x3_out = _conv(p["layer3_outconv"], x3, 1, 0)
    x3_up = _upsample2x_align_corners(x3_out)
    x2_out = _conv(p["layer2_outconv"], x2, 1, 0)
    q = p["layer2_outconv2"]
    x2_out = _conv(q["conv2"], jax.nn.leaky_relu(
        _bn(q["bn"], _conv(q["conv1"], x2_out + x3_up, 1, 1)), 0.01), 1, 1)
    x2_up = _upsample2x_align_corners(x2_out)
    x1_out = _conv(p["layer1_outconv"], x1, 1, 0)
    q = p["layer1_outconv2"]
    x1_out = _conv(q["conv2"], jax.nn.leaky_relu(
        _bn(q["bn"], _conv(q["conv1"], x1_out + x2_up, 1, 1)), 0.01), 1, 1)
    return x3_out, x1_out


# -- positional encoding ------------------------------------------------------


def sine_pos_encoding(d_model: int, h: int, w: int,
                      temp_bug_fix: bool = False) -> np.ndarray:
    """Sinusoidal 2-D PE, (h, w, d_model) channels-last.

    temp_bug_fix=False reproduces the original implementation whose
    div_term evaluates to exp(-arange(0, d/2, 2)) due to an operator-
    precedence bug; published checkpoints were trained with it.
    """
    n_freq = d_model // 4
    steps = np.arange(0, d_model // 2, 2, dtype=np.float64)
    if temp_bug_fix:
        div_term = np.exp(steps * (-math.log(10000.0) / (d_model // 2)))
    else:
        div_term = np.exp(steps * (-math.log(10000.0) / d_model // 2))
    y_pos = np.arange(1, h + 1, dtype=np.float64)[:, None, None]
    x_pos = np.arange(1, w + 1, dtype=np.float64)[None, :, None]
    pe = np.zeros((h, w, d_model), np.float32)
    pe[:, :, 0::4] = np.sin(x_pos * div_term).astype(np.float32) \
        * np.ones((h, 1, 1), np.float32)
    pe[:, :, 1::4] = np.cos(x_pos * div_term).astype(np.float32) \
        * np.ones((h, 1, 1), np.float32)
    pe[:, :, 2::4] = np.sin(y_pos * div_term).astype(np.float32) \
        * np.ones((1, w, 1), np.float32)
    pe[:, :, 3::4] = np.cos(y_pos * div_term).astype(np.float32) \
        * np.ones((1, w, 1), np.float32)
    assert n_freq == len(steps)
    return pe


# -- linear-attention transformer --------------------------------------------


def _linear_attention(q: Array, k: Array, v: Array,
                      kv_mask: Array | None) -> Array:
    """elu+1 feature-map linear attention (O(N d^2), no attn matrix).

    q/k/v: (B, N, H, D); kv_mask (B, N) or None. Matches the torch
    implementation bit-for-bit: V is pre-scaled by the STATIC key length
    to avoid overflow, masked K/V rows are zeroed.
    """
    fq = jax.nn.elu(q) + 1.0
    fk = jax.nn.elu(k) + 1.0
    if kv_mask is not None:
        m = kv_mask[:, :, None, None].astype(fk.dtype)
        fk = fk * m
        v = v * m
    n = v.shape[1]
    v = v / n
    kv = jnp.einsum("bshd,bshv->bhdv", fk, v)
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", fq, fk.sum(axis=1)) + 1e-6)
    return jnp.einsum("blhd,bhdv,blh->blhv", fq, kv, z) * n


def encoder_layer_apply(p: dict, x: Array, source: Array,
                        src_mask: Array | None, nhead: int) -> Array:
    """One LoFTREncoderLayer (pre-proj QKV, linear attention, merge,
    concat-MLP residual)."""
    b, n, d = x.shape
    dim = d // nhead
    q = _linear(p["q_proj"], x).reshape(b, n, nhead, dim)
    k = _linear(p["k_proj"], source).reshape(b, -1, nhead, dim)
    v = _linear(p["v_proj"], source).reshape(b, -1, nhead, dim)
    msg = _linear_attention(q, k, v, src_mask).reshape(b, n, d)
    msg = _layer_norm(p["norm1"], _linear(p["merge"], msg))
    msg = jnp.concatenate([x, msg], -1)
    msg = _linear(p["mlp2"], jax.nn.relu(_linear(p["mlp0"], msg)))
    return x + _layer_norm(p["norm2"], msg)


def lft_apply(layers: dict, feat0: Array, feat1: Array,
              mask0: Array | None, mask1: Array | None,
              nhead: int, n_pairs: int) -> tuple[Array, Array]:
    """LocalFeatureTransformer with ['self','cross'] * n_pairs layers.

    ``layers`` holds parameters stacked along a leading axis of size
    n_pairs: {"self": ..., "cross": ...}; one scanned body per pair.
    """

    def body(carry, lp):
        f0, f1 = carry
        f0 = encoder_layer_apply(lp["self"], f0, f0, mask0, nhead)
        f1 = encoder_layer_apply(lp["self"], f1, f1, mask1, nhead)
        # cross updates are SEQUENTIAL like the official implementation:
        # feat1 attends to the ALREADY-UPDATED feat0 (checkpoints were
        # trained with this ordering)
        f0 = encoder_layer_apply(lp["cross"], f0, f1, mask1, nhead)
        f1 = encoder_layer_apply(lp["cross"], f1, f0, mask0, nhead)
        return (f0, f1), None

    if n_pairs == 1:
        (feat0, feat1), _ = body((feat0, feat1),
                                 jax.tree.map(lambda a: a[0], layers))
        return feat0, feat1
    (feat0, feat1), _ = jax.lax.scan(body, (feat0, feat1), layers)
    return feat0, feat1


# -- coarse matching ----------------------------------------------------------


def coarse_match(conf: Array, mask0: Array, mask1: Array,
                 hw0_c: tuple, hw1_c: tuple, thr: float, border_rm: int,
                 max_matches: int):
    """Masked static-shape extraction of dual-softmax mutual matches.

    conf (L0, L1); returns (i, j, conf, valid) each (M,). Equivalent to
    the torch path: threshold -> border removal -> mutual-NN -> nonzero,
    but with a top-K gather so shapes stay static.
    """
    h0c, w0c = hw0_c
    h1c, w1c = hw1_c
    l0 = h0c * w0c

    bj = jnp.argmax(conf, axis=1)                           # (L0,)
    bv = jnp.max(conf, axis=1)
    bi = jnp.argmax(conf, axis=0)                           # (L1,)
    mutual = jnp.take(bi, bj) == jnp.arange(l0)

    def border_ok(h, w, rm):
        r = jnp.arange(h * w) // w
        c = jnp.arange(h * w) % w
        return (r >= rm) & (r < h - rm) & (c >= rm) & (c < w - rm)

    ok = (
        mutual
        & (bv > thr)
        & border_ok(h0c, w0c, border_rm)
        & jnp.take(border_ok(h1c, w1c, border_rm), bj)
        & mask0
        & jnp.take(mask1, bj)
    )
    score = jnp.where(ok, bv, 0.0)
    topv, topi = jax.lax.top_k(score, max_matches)
    return topi, jnp.take(bj, topi), topv, topv > 0.0


# -- fine stage ---------------------------------------------------------------


def _gather_windows(feat_f: Array, idx: Array, wc: int, window: int,
                    stride: int) -> Array:
    """5x5 fine-feature windows centered on coarse cells (zero-padded
    out of bounds, exactly like F.unfold with padding=W//2)."""
    hf, wf, c = feat_f.shape
    r = (idx // wc) * stride
    col = (idx % wc) * stride
    off = jnp.arange(window) - window // 2
    rows = r[:, None, None] + off[None, :, None]            # (M, W, 1)
    cols = col[:, None, None] + off[None, None, :]          # (M, 1, W)
    inb = ((rows >= 0) & (rows < hf) & (cols >= 0) & (cols < wf))
    rows = jnp.clip(rows, 0, hf - 1)
    cols = jnp.clip(cols, 0, wf - 1)
    win = feat_f[rows, cols]                                # (M, W, W, C)
    win = jnp.where(inb[..., None], win, 0.0)
    m = idx.shape[0]
    return win.reshape(m, window * window, c)


def fine_match(f0: Array, f1: Array, window: int):
    """Center-vs-window dual softmax + normalized spatial expectation.

    f0/f1 (M, W*W, C); returns (coords (M, 2) in [-1, 1], std (M,))."""
    m, ww, c = f0.shape
    center = f0[:, ww // 2, :]
    sim = jnp.einsum("mc,mrc->mr", center, f1) / math.sqrt(c)
    heat = jax.nn.softmax(sim, axis=1)
    g = np.linspace(-1.0, 1.0, window, dtype=np.float32)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1))  # (WW, 2)
    coords = heat @ grid                                        # (M, 2)
    var = heat @ (grid ** 2) - coords ** 2
    std = jnp.sqrt(jnp.clip(var, 1e-10)).sum(-1)
    return coords, std


# -- full model ---------------------------------------------------------------


class LoFTR:
    """Exact-architecture LoFTR with a statically-shaped jitted forward.

    match_pair(params, img0, img1) -> dict with per-pair padded arrays:
      keypoints0/1 (B, M, 2) pixel coords, confidence (B, M),
      descriptors0/1 (B, M, 128) L2-normalized fine center features
      (a bonus over the torch model, which discards them), valid (B, M).

    Instances hash/eq by config so jit caches survive re-instantiation.
    """

    def __init__(
        self,
        d_model_c: int = 256,
        d_model_f: int = 128,
        nhead: int = 8,
        coarse_pairs: int = 4,
        fine_pairs: int = 1,
        initial_dim: int = 128,
        block_dims: tuple = (128, 196, 256),
        temp_bug_fix: bool = False,
        thr: float = 0.2,
        border_rm: int = 2,
        dsmax_temperature: float = 0.1,
        fine_window: int = 5,
        max_matches: int = 1024,
        precision: str = "default",
    ):
        self.d_model_c = d_model_c
        self.d_model_f = d_model_f
        self.nhead = nhead
        self.coarse_pairs = coarse_pairs
        self.fine_pairs = fine_pairs
        self.initial_dim = initial_dim
        self.block_dims = tuple(block_dims)
        self.temp_bug_fix = bool(temp_bug_fix)
        self.thr = float(thr)
        self.border_rm = int(border_rm)
        self.dsmax_temperature = float(dsmax_temperature)
        self.fine_window = int(fine_window)
        self.max_matches = int(max_matches)
        self.precision = precision

    def _key(self):
        return (type(self), self.d_model_c, self.d_model_f, self.nhead,
                self.coarse_pairs, self.fine_pairs, self.initial_dim,
                self.block_dims, self.temp_bug_fix, self.thr,
                self.border_rm, self.dsmax_temperature, self.fine_window,
                self.max_matches, self.precision)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, LoFTR) and self._key() == other._key()

    # -- init -----------------------------------------------------------------

    def init(self, rng=0) -> dict:
        """Random parameters with the converter's exact tree layout."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        rngs = iter(jax.random.split(rng, 512))

        def conv(kh, kw, cin, cout):
            fan = kh * kw * cin
            return {"w": jax.random.normal(
                next(rngs), (kh, kw, cin, cout)) / math.sqrt(fan)}

        def bnp(c):
            return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                    "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

        def block(cin, cout, stride):
            p = {"conv1": conv(3, 3, cin, cout), "bn1": bnp(cout),
                 "conv2": conv(3, 3, cout, cout), "bn2": bnp(cout)}
            if stride != 1:
                p["down_conv"] = conv(1, 1, cin, cout)
                p["down_bn"] = bnp(cout)
            return p

        d0, d1, d2 = self.block_dims
        bb = {
            "conv1": conv(7, 7, 1, self.initial_dim),
            "bn1": bnp(self.initial_dim),
            "layer1": [block(self.initial_dim, d0, 1), block(d0, d0, 1)],
            "layer2": [block(d0, d1, 2), block(d1, d1, 1)],
            "layer3": [block(d1, d2, 2), block(d2, d2, 1)],
            "layer3_outconv": conv(1, 1, d2, d2),
            "layer2_outconv": conv(1, 1, d1, d2),
            "layer2_outconv2": {"conv1": conv(3, 3, d2, d2),
                                "bn": bnp(d2),
                                "conv2": conv(3, 3, d2, d1)},
            "layer1_outconv": conv(1, 1, d0, d1),
            "layer1_outconv2": {"conv1": conv(3, 3, d1, d1),
                                "bn": bnp(d1),
                                "conv2": conv(3, 3, d1, d0)},
        }

        def lin(din, dout, bias=False):
            p = {"w": jax.random.normal(
                next(rngs), (din, dout)) / math.sqrt(din)}
            if bias:
                p["b"] = jnp.zeros((dout,))
            return p

        def enc_layer(d):
            return {
                "q_proj": lin(d, d), "k_proj": lin(d, d), "v_proj": lin(d, d),
                "merge": lin(d, d),
                "mlp0": lin(2 * d, 2 * d), "mlp2": lin(2 * d, d),
                "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
                "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            }

        def stack_pairs(d, n):
            pairs = [{"self": enc_layer(d), "cross": enc_layer(d)}
                     for _ in range(n)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *pairs)

        return {
            "backbone": bb,
            "coarse": stack_pairs(self.d_model_c, self.coarse_pairs),
            "fine_preprocess": {
                "down_proj": lin(self.d_model_c, self.d_model_f, bias=True),
                "merge_feat": lin(2 * self.d_model_f, self.d_model_f,
                                  bias=True),
            },
            "fine": stack_pairs(self.d_model_f, self.fine_pairs),
        }

    # -- forward --------------------------------------------------------------

    def _forward_pair(self, params: dict, img0: Array, img1: Array,
                      mask_c0: Array, mask_c1: Array) -> dict:
        """One image pair, everything fused. imgs (H, W) float [0, 1]."""
        h0, w0 = img0.shape
        h1, w1 = img1.shape
        hw0_c = (h0 // 8, w0 // 8)
        hw1_c = (h1 // 8, w1 // 8)
        l0 = hw0_c[0] * hw0_c[1]
        l1 = hw1_c[0] * hw1_c[1]

        imgs_same = img0.shape == img1.shape
        if imgs_same:
            fc, ff = backbone_apply(
                params["backbone"], jnp.stack([img0, img1])[..., None])
            fc0, fc1 = fc[0], fc[1]
            ff0, ff1 = ff[0], ff[1]
        else:
            fc0, ff0 = backbone_apply(params["backbone"],
                                      img0[None, ..., None])
            fc1, ff1 = backbone_apply(params["backbone"],
                                      img1[None, ..., None])
            fc0, ff0, fc1, ff1 = fc0[0], ff0[0], fc1[0], ff1[0]

        pe0 = jnp.asarray(sine_pos_encoding(
            self.d_model_c, hw0_c[0], hw0_c[1], self.temp_bug_fix))
        pe1 = pe0 if hw0_c == hw1_c else jnp.asarray(sine_pos_encoding(
            self.d_model_c, hw1_c[0], hw1_c[1], self.temp_bug_fix))
        c0 = (fc0 + pe0).reshape(1, l0, self.d_model_c)
        c1 = (fc1 + pe1).reshape(1, l1, self.d_model_c)

        c0, c1 = lft_apply(params["coarse"], c0, c1,
                           mask_c0[None], mask_c1[None],
                           self.nhead, self.coarse_pairs)
        c0, c1 = c0[0], c1[0]

        # dual-softmax coarse matching
        n0 = c0 / math.sqrt(self.d_model_c)
        n1 = c1 / math.sqrt(self.d_model_c)
        sim = jnp.einsum("lc,sc->ls", n0, n1,
                         preferred_element_type=jnp.float32) \
            / self.dsmax_temperature
        neg = -1e9
        sim = jnp.where(mask_c0[:, None] & mask_c1[None, :], sim, neg)
        conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)

        i, j, mconf, valid = coarse_match(
            conf, mask_c0, mask_c1, hw0_c, hw1_c,
            self.thr, self.border_rm, min(self.max_matches, l0))

        mkpts0_c = jnp.stack([(i % hw0_c[1]).astype(jnp.float32) * 8.0,
                              (i // hw0_c[1]).astype(jnp.float32) * 8.0], -1)
        mkpts1_c = jnp.stack([(j % hw1_c[1]).astype(jnp.float32) * 8.0,
                              (j // hw1_c[1]).astype(jnp.float32) * 8.0], -1)

        # fine stage
        w = self.fine_window
        stride = 4  # hw_f / hw_c
        f0_win = _gather_windows(ff0, i, hw0_c[1], w, stride)
        f1_win = _gather_windows(ff1, j, hw1_c[1], w, stride)
        fp = params["fine_preprocess"]
        cf0 = _linear(fp["down_proj"], c0[i])            # (M, 128)
        cf1 = _linear(fp["down_proj"], c1[j])
        ww = w * w
        f0_win = _linear(fp["merge_feat"], jnp.concatenate(
            [f0_win, jnp.broadcast_to(cf0[:, None], (i.shape[0], ww,
                                                     self.d_model_f))], -1))
        f1_win = _linear(fp["merge_feat"], jnp.concatenate(
            [f1_win, jnp.broadcast_to(cf1[:, None], (j.shape[0], ww,
                                                     self.d_model_f))], -1))
        f0_win, f1_win = lft_apply(params["fine"], f0_win, f1_win,
                                   None, None, self.nhead, self.fine_pairs)
        coords, std = fine_match(f0_win, f1_win, w)
        mkpts1 = mkpts1_c + coords * (w // 2) * 2.0

        def l2n(d):
            return d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

        vf = valid[:, None]
        return {
            "keypoints0": jnp.where(vf, mkpts0_c, 0.0),
            "keypoints1": jnp.where(vf, mkpts1, 0.0),
            "confidence": jnp.where(valid, mconf, 0.0),
            "descriptors0": jnp.where(vf, l2n(f0_win[:, ww // 2]), 0.0),
            "descriptors1": jnp.where(vf, l2n(f1_win[:, ww // 2]), 0.0),
            "std": std,
            "valid": valid,
        }

    @partial(jax.jit, static_argnums=0, static_argnames=("hw0", "hw1"))
    def _match_padded(self, params, img0, img1, hw0, hw1):
        """Single (possibly padded) pair; hw* = true (h, w) before pad."""
        def cell_mask(shape, hw):
            hc, wc = shape[0] // 8, shape[1] // 8
            r = jnp.arange(hc * wc) // wc
            c = jnp.arange(hc * wc) % wc
            return (r * 8 < hw[0]) & (c * 8 < hw[1])

        with jax.default_matmul_precision(self.precision):
            return self._forward_pair(
                params, img0, img1,
                cell_mask(img0.shape, hw0), cell_mask(img1.shape, hw1))

    # coarse token budget: the dual-softmax sim matrix is L0 x L1 f32;
    # 32k tokens ~ 4 GB — beyond that the forward cannot fit one chip
    MAX_COARSE_TOKENS = 32768

    def _check_size(self, h: int, w: int) -> None:
        l = (h // 8) * (w // 8)
        if l > self.MAX_COARSE_TOKENS:
            raise ValueError(
                f"LoFTR coarse grid {h // 8}x{w // 8} = {l} tokens "
                f"(> {self.MAX_COARSE_TOKENS}): the L0xL1 similarity "
                f"matrix would not fit one chip. Use a lower Quality "
                f"or tile the frame (TileSelection.GRID/PRESELECTION "
                f"with a finer grid).")

    def match_pair(self, params: dict, img0, img1) -> dict:
        """Host entry: pads each image to /8 and runs the fused forward."""
        img0 = jnp.asarray(img0, jnp.float32)
        img1 = jnp.asarray(img1, jnp.float32)
        self._check_size(*img0.shape)
        self._check_size(*img1.shape)
        hw0 = (int(img0.shape[0]), int(img0.shape[1]))
        hw1 = (int(img1.shape[0]), int(img1.shape[1]))

        def pad8(im):
            ph, pw = (-im.shape[0]) % 8, (-im.shape[1]) % 8
            if ph or pw:
                im = jnp.pad(im, ((0, ph), (0, pw)))
            return im

        return self._match_padded(params, pad8(img0), pad8(img1), hw0, hw1)

    @partial(jax.jit, static_argnums=0)
    def match_batch(self, params, imgs0: Array, imgs1: Array,
                    pair_valid: Array) -> dict:
        """Vmapped forward over a (B, H, W) tile-pair batch; tiles pad
        to the 8-px cell grid internally (pad cells masked out);
        pair_valid masks bucket padding."""
        b, h0, w0 = imgs0.shape
        ph, pw = (-h0) % 8, (-w0) % 8
        if ph or pw:
            imgs0 = jnp.pad(imgs0, ((0, 0), (0, ph), (0, pw)))
            imgs1 = jnp.pad(imgs1, ((0, 0), (0, ph), (0, pw)))
        hc, wc = (h0 + ph) // 8, (w0 + pw) // 8
        r = jnp.arange(hc * wc) // wc
        c = jnp.arange(hc * wc) % wc
        cell = (r * 8 < h0) & (c * 8 < w0)

        with jax.default_matmul_precision(self.precision):
            out = jax.vmap(
                lambda a, d: self._forward_pair(params, a, d, cell, cell)
            )(imgs0, imgs1)
        out["valid"] = out["valid"] & pair_valid[:, None]
        return out


def loftr_init(rng=0, **kwargs) -> tuple[LoFTR, dict]:
    model = LoFTR(**kwargs)
    return model, model.init(rng)
