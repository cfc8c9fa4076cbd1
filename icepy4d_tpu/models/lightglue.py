"""LightGlue matcher, TPU-native.

Re-design of the vendored torch LightGlue
(ref thirdparty/LightGlue/lightglue/lightglue.py:309-585):

  learnable Fourier rotary positional encoding        (lightglue.py:60-75)
  n_layers x (rotary self-attention + bidirectional
              cross-attention, each with concat-FFN)  (lightglue.py:133-251)
  sigmoid-log-double-softmax match assignment         (lightglue.py:253-288)
  mutual-max + threshold match extraction             (lightglue.py:290-306)

TPU-first differences:
  * static shapes: inputs are padded keypoint sets with validity masks
    (the reference pads only under torch.compile, lightglue.py:458-466);
    attention and assignment are mask-aware, outputs carry masks.
  * static depth by default: all layers run every time (the batched
    static forward is usually fastest on TPU). The reference's adaptive
    early-exit + point pruning (lightglue.py:491-510, 563-579) is
    available as `match_adaptive`: the forward is cut into jit-compiled
    SEGMENTS with static shapes; at segment boundaries the (tiny)
    confidence/matchability vectors cross to the host, which decides to
    stop early (adaptive depth) and/or gather surviving tokens into the
    next power-of-two capacity bucket (adaptive width) — each
    (capacity, segment) pair compiles once and is cached. Worth it for
    co-located hardware / very large token counts; over a high-latency
    tunnel the extra dispatches usually cost more than the saved FLOPs.
  * batch-first everywhere; attention einsums hit the MXU in one fused
    program over (B=tile-pairs, H=4, N, 64).

Param layout matches models.convert.lightglue_params_from_torch, so the
official `superpoint_lightglue.pth` drops in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e9


def normalize_keypoints(kpts: Array, size) -> Array:
    """Map pixel kpts into [-1, 1] by image size (lightglue.py:24-35).

    kpts (..., N, 2); size (..., 2) as (w, h) or None to use kpt extent.
    """
    if size is None:
        size = 1.0 + jnp.max(kpts, -2) - jnp.min(kpts, -2)
    else:
        size = jnp.asarray(size, kpts.dtype)
    shift = size / 2.0
    scale = jnp.max(size, -1) / 2.0
    return (kpts - shift[..., None, :]) / scale[..., None, None]


def _linear(p: dict, x: Array) -> Array:
    # weights cast to the activation dtype so a bf16 trunk runs bf16
    # matmuls end to end (f32 weights would promote every product)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _layer_norm(p: dict, x: Array, eps: float = 1e-5) -> Array:
    # statistics in f32 regardless of the activation dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _ffn(p: dict, x: Array, message: Array) -> Array:
    """x + FFN([x | message]) (lightglue.py:144-149, GELU is exact erf)."""
    h = _linear(p["dense1"], jnp.concatenate([x, message], -1))
    h = _layer_norm(p["norm"], h)
    h = jax.nn.gelu(h, approximate=False)
    return x + _linear(p["dense2"], h)


def rotary_encoding(p: dict, kpts: Array) -> tuple[Array, Array]:
    """Learnable Fourier features -> (cos, sin) each (..., N, head_dim)."""
    proj = kpts @ p["Wr"]["kernel"]  # (..., N, head_dim/2)
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
    return cos, sin


def _rotate_half(x: Array) -> Array:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], -1).reshape(x.shape)


def _apply_rotary(t: Array, cos: Array, sin: Array) -> Array:
    """t (B,H,N,hd); cos/sin (B,N,hd) broadcast over heads."""
    return t * cos[:, None] + _rotate_half(t) * sin[:, None]


def _sdpa(q: Array, k: Array, v: Array, kmask: Array) -> Array:
    """Masked scaled-dot-product attention.

    q,k,v (B,H,N,hd); kmask (B,Nk) key validity. Uses the fused Pallas
    flash kernel on TPU when shapes allow, else one XLA einsum program.
    """
    from icepy4d_tpu.ops.attention import masked_attention

    return masked_attention(q, k, v, kmask)


def self_block(p: dict, x: Array, enc: tuple, mask: Array, num_heads: int,
               attn=None) -> Array:
    b, n, d = x.shape
    hd = d // num_heads
    qkv = _linear(p["Wqkv"], x)  # (B, N, 3D)
    # torch layout: unflatten(-1, (H, hd, 3)) (lightglue.py:155)
    qkv = qkv.reshape(b, n, num_heads, hd, 3).transpose(0, 2, 1, 3, 4)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    cos, sin = enc
    q = _apply_rotary(q, cos, sin)
    k = _apply_rotary(k, cos, sin)
    ctx = (attn or _sdpa)(q, k, v, mask)
    message = _linear(p["out"], ctx.transpose(0, 2, 1, 3).reshape(b, n, d))
    return _ffn(p["ffn"], x, message)


def cross_block(
    p: dict, x0: Array, x1: Array, mask0: Array, mask1: Array,
    num_heads: int, attn=None,
) -> tuple[Array, Array]:
    b, n0, d = x0.shape
    n1 = x1.shape[1]
    hd = d // num_heads

    def heads(t):
        return t.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)

    qk0 = heads(_linear(p["to_qk"], x0))
    qk1 = heads(_linear(p["to_qk"], x1))
    v0 = heads(_linear(p["to_v"], x0))
    v1 = heads(_linear(p["to_v"], x1))
    m0 = (attn or _sdpa)(qk0, qk1, v1, mask1)
    m1 = (attn or _sdpa)(qk1, qk0, v0, mask0)
    m0 = _linear(p["out"], m0.transpose(0, 2, 1, 3).reshape(b, n0, d))
    m1 = _linear(p["out"], m1.transpose(0, 2, 1, 3).reshape(b, n1, d))
    return _ffn(p["ffn"], x0, m0), _ffn(p["ffn"], x1, m1)


def sigmoid_log_double_softmax(
    sim: Array, z0: Array, z1: Array, mask0: Array, mask1: Array
) -> Array:
    """Log assignment matrix (B, M+1, N+1) (lightglue.py:253-265),
    mask-aware: invalid rows/cols get NEG_INF in the match block."""
    b, m, n = sim.shape
    pair_valid = mask0[:, :, None] & mask1[:, None, :]
    sim = jnp.where(pair_valid, sim, NEG_INF)
    certainties = jax.nn.log_sigmoid(z0)[:, :, None] + \
        jax.nn.log_sigmoid(z1)[:, None, :]
    scores0 = jax.nn.log_softmax(sim, axis=2)
    scores1 = jax.nn.log_softmax(sim, axis=1)
    block = jnp.where(pair_valid, scores0 + scores1 + certainties, NEG_INF)
    scores = jnp.zeros((b, m + 1, n + 1), sim.dtype)
    scores = scores.at[:, :m, :n].set(block)
    scores = scores.at[:, :m, n].set(
        jnp.where(mask0, jax.nn.log_sigmoid(-z0), NEG_INF))
    scores = scores.at[:, m, :n].set(
        jnp.where(mask1, jax.nn.log_sigmoid(-z1), NEG_INF))
    return scores


def match_assignment(
    p: dict, d0: Array, d1: Array, mask0: Array, mask1: Array
) -> Array:
    # the assignment head always scores in f32 (a bf16 trunk hands
    # bf16 descriptors in; log-softmax margins decide matches)
    d0 = d0.astype(jnp.float32)
    d1 = d1.astype(jnp.float32)
    md0 = _linear(p["final_proj"], d0)
    md1 = _linear(p["final_proj"], d1)
    dd = md0.shape[-1]
    md0 = md0 / dd ** 0.25
    md1 = md1 / dd ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1,
                     preferred_element_type=jnp.float32)
    z0 = _linear(p["matchability"], d0)[..., 0]
    z1 = _linear(p["matchability"], d1)[..., 0]
    return sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)


def matchability(p: dict, d: Array) -> Array:
    return jax.nn.sigmoid(_linear(p["matchability"], d)[..., 0])


def token_confidence(p: dict, d: Array) -> Array:
    return jax.nn.sigmoid(_linear(p["token"], d)[..., 0])


def filter_matches(scores: Array, th: float) -> tuple[Array, Array, Array, Array]:
    """Mutual-max match extraction from log assignment (lightglue.py:290-306).

    Returns (matches0 (B,M) int32 [-1 = unmatched], matches1 (B,N),
    mscores0 (B,M), mscores1 (B,N)). Fully static shapes.
    """
    block = scores[:, :-1, :-1]
    b, m, n = block.shape
    m0 = jnp.argmax(block, axis=2)
    m1 = jnp.argmax(block, axis=1)
    max0 = jnp.max(block, axis=2)
    inds0 = jnp.arange(m)[None]
    inds1 = jnp.arange(n)[None]
    mutual0 = inds0 == jnp.take_along_axis(m1, m0, 1)
    mutual1 = inds1 == jnp.take_along_axis(m0, m1, 1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, 1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, 1)
    matches0 = jnp.where(valid0, m0, -1).astype(jnp.int32)
    matches1 = jnp.where(valid1, m1, -1).astype(jnp.int32)
    return matches0, matches1, mscores0, mscores1


class LightGlue:
    """Static-shape batched LightGlue.

    match(params, data) where data = dict(
      kpts0 (B,M,2), desc0 (B,M,D), mask0 (B,M), size0 (B,2) or None,
      kpts1, desc1, mask1, size1)
    -> dict(matches0 (B,M) int32, matches1, mscores0, mscores1,
            log_assignment (B,M+1,N+1)).
    """

    def __init__(
        self,
        n_layers: int = 9,
        num_heads: int = 4,
        descriptor_dim: int = 256,
        input_dim: int = 256,
        filter_threshold: float = 0.1,
        precision: str = "default",
        activation_dtype: str = "float32",
    ):
        self.n_layers = n_layers
        self.num_heads = num_heads
        self.descriptor_dim = descriptor_dim
        self.input_dim = input_dim
        self.filter_threshold = float(filter_threshold)
        # "default" = single-pass bf16 MXU matmuls; parity tests use
        # "highest" to match the torch f32 oracle
        self.precision = precision
        # "bfloat16" halves the HBM traffic of the transformer trunk's
        # activations (the forward is partly relayout/elementwise-bound
        # at production batch sizes); layernorm statistics, the
        # attention softmax, and the assignment head stay f32
        self.activation_dtype = str(activation_dtype)

    def _key(self):
        return (type(self), self.n_layers, self.num_heads,
                self.descriptor_dim, self.input_dim,
                self.filter_threshold, self.precision,
                self.activation_dtype)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, LightGlue) and self._key() == other._key()

    # -- initialization ----------------------------------------------------
    def init(self, rng=0) -> dict:
        """Random init. Host-side numpy RNG: eager per-param device ops are
        pathologically slow over remote-TPU tunnels (~1.5 s per dispatch)."""
        d = self.descriptor_dim
        hd = d // self.num_heads
        seed = rng if isinstance(rng, int) else int(
            np.asarray(jax.random.key_data(rng)).ravel()[-1])
        npr = np.random.default_rng(seed)

        def lin(din, dout, bias=True):
            p = {"kernel": jnp.asarray(
                npr.normal(size=(din, dout)) / np.sqrt(din), jnp.float32)}
            if bias:
                p["bias"] = jnp.zeros((dout,))
            return p

        def ffn():
            return {
                "dense1": lin(2 * d, 2 * d),
                "norm": {"scale": jnp.ones((2 * d,)), "bias": jnp.zeros((2 * d,))},
                "dense2": lin(2 * d, d),
            }

        params = {
            "input_proj": lin(self.input_dim, d),
            "posenc": {"Wr": {"kernel": jnp.asarray(
                npr.normal(size=(2, hd // 2)), jnp.float32)}},
            "layers": [], "assign": [], "confidence": [],
        }
        for i in range(self.n_layers):
            params["layers"].append({
                "self_attn": {"Wqkv": lin(d, 3 * d), "out": lin(d, d),
                              "ffn": ffn()},
                "cross_attn": {"to_qk": lin(d, d), "to_v": lin(d, d),
                               "out": lin(d, d), "ffn": ffn()},
            })
            params["assign"].append({
                "matchability": lin(d, 1), "final_proj": lin(d, d)})
            if i < self.n_layers - 1:
                params["confidence"].append({"token": lin(d, 1)})
        return params

    def match_flops(self, batch: int, m: int, n: int | None = None) -> float:
        """Analytic matmul FLOPs of one static match() forward over
        (batch, m, n) padded keypoint sets (2*m*n*k per matmul;
        softmax/rotary/layernorm excluded, <1% by XLA's own count —
        pinned against the compiled cost analysis in tests/test_flops.py).
        Used for MFU when the remote backend cannot serve a cost
        analysis."""
        n = m if n is None else n
        d, L, di = self.descriptor_dim, self.n_layers, self.input_dim
        s = float(m + n)
        proj = 2 * s * di * d
        # self block per side (k tokens): Wqkv 6kd^2 + attn 4k^2 d
        #   + out 2kd^2 + ffn (2d->2d, 2d->d) 12kd^2
        self_b = (20 * d * d * (m + n)
                  + 4 * d * (float(m) * m + float(n) * n))
        # cross block: to_qk/to_v/out 6*(m+n)d^2 + ffn 12*(m+n)d^2
        #   + two attention directions 8mnd
        cross_b = 18 * s * d * d + 8 * float(m) * n * d
        assign = 2 * s * d * d + 2 * float(m) * n * d + 2 * s * d
        return batch * (proj + L * (self_b + cross_b) + assign)

    # -- forward -----------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def match(self, params: dict, data: dict) -> dict:
        with jax.default_matmul_precision(self.precision):
            return self._match(params, data)

    def _match(self, params: dict, data: dict) -> dict:
        kpts0 = normalize_keypoints(data["kpts0"], data.get("size0"))
        kpts1 = normalize_keypoints(data["kpts1"], data.get("size1"))
        mask0 = data["mask0"]
        mask1 = data["mask1"]

        d0 = _linear(params["input_proj"], data["desc0"].astype(jnp.float32)) \
            if "kernel" in params["input_proj"] else data["desc0"]
        d1 = _linear(params["input_proj"], data["desc1"].astype(jnp.float32)) \
            if "kernel" in params["input_proj"] else data["desc1"]

        enc0 = rotary_encoding(params["posenc"], kpts0)
        enc1 = rotary_encoding(params["posenc"], kpts1)

        act = jnp.dtype(self.activation_dtype)
        if act != jnp.float32:
            d0, d1 = d0.astype(act), d1.astype(act)
            enc0 = tuple(e.astype(act) for e in enc0)
            enc1 = tuple(e.astype(act) for e in enc1)

        # lax.scan over stacked layers: 9x smaller HLO than an unrolled
        # loop (compile time matters — remote-TPU compiles are expensive)
        nh = self.num_heads
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])

        def body(carry, layer):
            c0, c1 = carry
            c0 = self_block(layer["self_attn"], c0, enc0, mask0, nh)
            c1 = self_block(layer["self_attn"], c1, enc1, mask1, nh)
            c0, c1 = cross_block(layer["cross_attn"], c0, c1, mask0, mask1,
                                 nh)
            return (c0, c1), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), stacked)

        scores = match_assignment(params["assign"][-1], d0, d1, mask0, mask1)
        matches0, matches1, ms0, ms1 = filter_matches(
            scores, self.filter_threshold)
        matches0 = jnp.where(mask0, matches0, -1)
        matches1 = jnp.where(mask1, matches1, -1)
        return {
            "matches0": matches0,
            "matches1": matches1,
            "mscores0": jnp.where(mask0, ms0, 0.0),
            "mscores1": jnp.where(mask1, ms1, 0.0),
            "log_assignment": scores,
        }


    # -- adaptive depth/width (ref lightglue.py:491-510, 563-579) -----------

    def confidence_threshold(self, layer_index: int) -> float:
        """Per-layer exit threshold (ref lightglue.py:320-324)."""
        return 0.8 + 0.1 * float(np.exp(-4.0 * layer_index / self.n_layers))

    @partial(jax.jit, static_argnums=0)
    def _prep(self, params, data):
        kpts0 = normalize_keypoints(data["kpts0"], data.get("size0"))
        kpts1 = normalize_keypoints(data["kpts1"], data.get("size1"))
        proj = lambda d: _linear(params["input_proj"],
                                 d.astype(jnp.float32)) \
            if "kernel" in params["input_proj"] else d
        return (proj(data["desc0"]), proj(data["desc1"]),
                rotary_encoding(params["posenc"], kpts0),
                rotary_encoding(params["posenc"], kpts1))

    @partial(jax.jit, static_argnums=0)
    def _run_segment(self, stacked, d0, d1, enc0, enc1, mask0, mask1):
        nh = self.num_heads

        def body(carry, layer):
            c0, c1 = carry
            c0 = self_block(layer["self_attn"], c0, enc0, mask0, nh)
            c1 = self_block(layer["self_attn"], c1, enc1, mask1, nh)
            c0, c1 = cross_block(layer["cross_attn"], c0, c1,
                                 mask0, mask1, nh)
            return (c0, c1), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), stacked)
        return d0, d1

    @partial(jax.jit, static_argnums=0)
    def _heads(self, conf_p, assign_p, d0, d1):
        """Boundary-layer diagnostics: token confidence + matchability."""
        return (token_confidence(conf_p, d0), token_confidence(conf_p, d1),
                matchability(assign_p, d0), matchability(assign_p, d1))

    @partial(jax.jit, static_argnums=(0, 6))
    def _gather_side(self, d, cos, sin, mask, keep_score, cap: int):
        """Prune-by-gather: pack the `cap` highest-priority tokens.

        keep_score ranks tokens (kept-and-valid first); returns packed
        (d, cos, sin, mask, idx) where idx maps packed slot -> original.
        """
        _, idx = jax.lax.top_k(keep_score, cap)           # (B, cap)
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), 1)
        kept = jnp.take_along_axis(keep_score, idx, 1) > 0
        return (take(d), take(cos), take(sin), kept, idx)

    @partial(jax.jit, static_argnums=0)
    def _finalize(self, assign_p, d0, d1, mask0, mask1):
        scores = match_assignment(assign_p, d0, d1, mask0, mask1)
        m0, m1, ms0, ms1 = filter_matches(scores, self.filter_threshold)
        return (jnp.where(mask0, m0, -1), jnp.where(mask1, m1, -1),
                jnp.where(mask0, ms0, 0.0), jnp.where(mask1, ms1, 0.0))

    def match_adaptive(
        self,
        params: dict,
        data: dict,
        depth_confidence: float = 0.95,
        width_confidence: float = 0.99,
        check_every: int = 3,
        min_capacity: int = 64,
    ) -> dict:
        """Adaptive-depth/width forward (host-driven segment loop).

        Reference semantics (lightglue.py:491-510, 563-579): after a
        checkpoint layer, if the fraction of confident tokens exceeds
        depth_confidence the net exits early and the CURRENT layer's
        assignment head extracts matches; tokens that are confident AND
        have matchability < (1 - width_confidence) are pruned. TPU-native
        realization: pruning gathers survivors into the next pow2
        capacity bucket (static shapes per segment; one compile per
        (capacity, segment-length)). Match indices are mapped back to the
        caller's original keypoint slots.

        Returns the same dict as match() minus "log_assignment", plus
        "layers_run" and final "capacity" diagnostics.
        """
        mask0 = np.asarray(data["mask0"])
        mask1 = np.asarray(data["mask1"])
        b, m = mask0.shape
        n = mask1.shape[1]
        d0, d1, enc0, enc1 = self._prep(params, data)
        jmask0, jmask1 = jnp.asarray(mask0), jnp.asarray(mask1)
        idx0 = np.broadcast_to(np.arange(m, dtype=np.int64), (b, m)).copy()
        idx1 = np.broadcast_to(np.arange(n, dtype=np.int64), (b, n)).copy()

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
        boundaries = list(range(check_every, self.n_layers, check_every))
        start = 0
        exited_at = self.n_layers
        assign_p = params["assign"][-1]
        for j in boundaries:
            seg = jax.tree.map(lambda a: a[start:j], stacked)
            d0, d1 = self._run_segment(
                seg, d0, d1, enc0, enc1, jmask0, jmask1)
            start = j
            li = j - 1  # index of the layer just completed
            c0, c1, s0, s1 = self._heads(
                params["confidence"][li], params["assign"][li], d0, d1)
            c0, c1 = np.asarray(c0), np.asarray(c1)
            s0, s1 = np.asarray(s0), np.asarray(s1)
            th = self.confidence_threshold(li)

            conf0 = (c0 > th) & mask0
            conf1 = (c1 > th) & mask1
            nvalid = mask0.sum() + mask1.sum()
            ratio = (conf0.sum() + conf1.sum()) / max(nvalid, 1)
            if depth_confidence > 0 and ratio >= depth_confidence:
                exited_at = j
                assign_p = params["assign"][li]
                break

            if width_confidence > 0:
                prune_th = 1.0 - width_confidence
                keep0 = mask0 & (~conf0 | (s0 > prune_th))
                keep1 = mask1 & (~conf1 | (s1 > prune_th))
                cap = max(int(keep0.sum(1).max() if b else 0),
                          int(keep1.sum(1).max() if b else 0),
                          min_capacity)
                cap = 1 << (cap - 1).bit_length()
                if cap <= max(m, n) // 2:
                    # rank: kept tokens first (score 1), the rest 0
                    ks0 = jnp.asarray(keep0, jnp.float32)
                    ks1 = jnp.asarray(keep1, jnp.float32)
                    d0, c0c, c0s, jmask0, g0 = self._gather_side(
                        d0, enc0[0], enc0[1], jmask0, ks0, cap)
                    d1, c1c, c1s, jmask1, g1 = self._gather_side(
                        d1, enc1[0], enc1[1], jmask1, ks1, cap)
                    enc0, enc1 = (c0c, c0s), (c1c, c1s)
                    g0, g1 = np.asarray(g0), np.asarray(g1)
                    idx0 = np.take_along_axis(idx0, g0, 1)
                    idx1 = np.take_along_axis(idx1, g1, 1)
                    mask0 = np.asarray(jmask0)
                    mask1 = np.asarray(jmask1)
        else:
            if start < self.n_layers:
                seg = jax.tree.map(lambda a: a[start:], stacked)
                d0, d1 = self._run_segment(
                    seg, d0, d1, enc0, enc1, jmask0, jmask1)

        pm0, pm1, pms0, pms1 = jax.tree.map(
            np.asarray,
            self._finalize(assign_p, d0, d1, jmask0, jmask1))

        # scatter back to the original keypoint slots
        matches0 = np.full((b, m), -1, np.int32)
        matches1 = np.full((b, n), -1, np.int32)
        mscores0 = np.zeros((b, m), np.float32)
        mscores1 = np.zeros((b, n), np.float32)
        rows = np.arange(b)[:, None]
        v0 = pm0 > -1
        # for each packed slot k, original slot idx0[b,k] gets target
        # idx1[b, pm0[b,k]]
        orig_tgt0 = np.where(v0, np.take_along_axis(
            idx1, np.maximum(pm0, 0), 1), -1)
        matches0[rows, idx0] = np.where(v0, orig_tgt0, -1).astype(np.int32)
        mscores0[rows, idx0] = pms0
        v1 = pm1 > -1
        orig_tgt1 = np.where(v1, np.take_along_axis(
            idx0, np.maximum(pm1, 0), 1), -1)
        matches1[rows, idx1] = np.where(v1, orig_tgt1, -1).astype(np.int32)
        mscores1[rows, idx1] = pms1
        return {
            "matches0": matches0, "matches1": matches1,
            "mscores0": mscores0, "mscores1": mscores1,
            "layers_run": exited_at,
            "capacity": int(jmask0.shape[1]),
        }


def lightglue_init(rng=None, **kwargs) -> tuple[LightGlue, dict]:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = LightGlue(**kwargs)
    return model, model.init(rng)
