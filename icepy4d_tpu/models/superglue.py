"""SuperGlue matcher, TPU-native.

Re-design of the vendored torch SuperGlue
(ref thirdparty/SuperGlue/models/superglue.py:74-305):

  keypoint encoder MLP [3,32,64,128,256,256] on (x, y, score)
  18 alternating self/cross attentional-propagation layers (4 heads)
  final 1x1 projection, scores = <md0, md1>/sqrt(D)
  Sinkhorn optimal transport in log space with a learned dustbin
  mutual-max + threshold match extraction

TPU-first differences:
  * static padded keypoint sets with validity masks. The Sinkhorn
    marginals use the RUNTIME valid counts (ms, ns from the masks), so a
    padded problem solves the exact same transport as the unpadded one
    (parity-tested); padded rows/columns carry ~zero mass and drain into
    the dustbin.
  * Sinkhorn iterations as lax.scan (ref superglue.py:152-160 python loop).
  * attention rides ops.attention.masked_attention (Pallas on TPU).
  * BatchNorms fold to inference affine transforms (running stats).

Param layout matches models.convert.superglue_params_from_torch, so the
official superglue_indoor/outdoor.pth checkpoints drop in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from icepy4d_tpu.models.lightglue import filter_matches
from icepy4d_tpu.ops.attention import masked_attention

Array = jax.Array

NEG = -1e9


def normalize_keypoints(kpts: Array, size: Array) -> Array:
    """size (..., 2) = (width, height); scale by 0.7*max(size)
    (ref superglue.py:64-71)."""
    size = jnp.asarray(size, kpts.dtype)
    center = size / 2.0
    scaling = jnp.max(size, -1, keepdims=True) * 0.7
    return (kpts - center[..., None, :]) / scaling[..., None, :]


def _linear(p: dict, x: Array) -> Array:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _mlp(layers: list, x: Array) -> Array:
    """Conv1d(+BN+ReLU) stack in token-last-dim layout; BN in eval mode."""
    n = len(layers)
    for i, layer in enumerate(layers):
        x = _linear(layer["dense"], x)
        if "bn" in layer:
            bn = layer["bn"]
            x = (x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * \
                bn["scale"] + bn["bias"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def keypoint_encoder(layers: list, kpts_n: Array, scores: Array) -> Array:
    inp = jnp.concatenate([kpts_n, scores[..., None]], -1)  # (B, N, 3)
    return _mlp(layers, inp)


def _attn_propagation(p: dict, x: Array, source: Array, src_mask: Array,
                      num_heads: int, attn=None) -> Array:
    """delta = MLP([x | MHA(x, source, source)]) (ref superglue.py:118-129).

    torch splits Conv1d channels as (head_dim, num_heads) — channel
    c = d*H + h — replicated here for checkpoint compatibility.
    """
    b, n, d = x.shape
    ns = source.shape[1]
    hd = d // num_heads

    def heads(t):
        # (B, N, D) -> (B, H, N, hd) with c = d*H + h channel order
        return t.reshape(b, -1, hd, num_heads).transpose(0, 3, 1, 2)

    q = heads(_linear(p["q"], x))
    k = heads(_linear(p["k"], source))
    v = heads(_linear(p["v"], source))
    ctx = (attn or masked_attention)(q, k, v, src_mask)
    ctx = ctx.transpose(0, 2, 3, 1).reshape(b, n, d)
    message = _linear(p["merge"], ctx)
    return _mlp(p["mlp"], jnp.concatenate([x, message], -1))


def log_sinkhorn(Z: Array, log_mu: Array, log_nu: Array, iters: int) -> Array:
    """Log-space Sinkhorn as lax.scan (ref superglue.py:152-160)."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.scipy.special.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.scipy.special.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(
    scores: Array, alpha: Array, iters: int, mask0: Array, mask1: Array
) -> Array:
    """Masked OT (ref superglue.py:163-186): marginals use runtime valid
    counts, padded rows/cols get ~zero mass."""
    b, m, n = scores.shape
    ms = jnp.sum(mask0, -1).astype(scores.dtype)  # (B,)
    ns = jnp.sum(mask1, -1).astype(scores.dtype)

    pair = mask0[:, :, None] & mask1[:, None, :]
    scores = jnp.where(pair, scores, NEG)
    bins0 = jnp.where(mask0, alpha, NEG)[:, :, None]
    bins1 = jnp.where(mask1, alpha, NEG)[:, None, :]
    couplings = jnp.concatenate([
        jnp.concatenate([scores, bins0], -1),
        jnp.concatenate([bins1, jnp.full((b, 1, 1), alpha, scores.dtype)], -1),
    ], 1)

    norm = -jnp.log(ms + ns)  # (B,)
    log_mu = jnp.concatenate([
        jnp.where(mask0, norm[:, None], NEG),
        (jnp.log(ns) + norm)[:, None],
    ], -1)
    log_nu = jnp.concatenate([
        jnp.where(mask1, norm[:, None], NEG),
        (jnp.log(ms) + norm)[:, None],
    ], -1)

    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm[:, None, None]


class SuperGlue:
    """Static-shape batched SuperGlue.

    match(params, data) with data = dict(
      kpts0 (B,M,2), desc0 (B,M,256), scores0 (B,M), mask0 (B,M),
      size0 (B,2) [w,h], kpts1/desc1/scores1/mask1/size1)
    -> dict(matches0, matches1, mscores0, mscores1, log_assignment).
    """

    def __init__(
        self,
        descriptor_dim: int = 256,
        keypoint_encoder: tuple = (32, 64, 128, 256),
        gnn_layers: int = 18,
        num_heads: int = 4,
        sinkhorn_iterations: int = 100,
        match_threshold: float = 0.2,
        precision: str = "default",
    ):
        self.precision = precision
        self.descriptor_dim = descriptor_dim
        self.kenc_channels = [3, *keypoint_encoder, descriptor_dim]
        self.gnn_layers = gnn_layers  # alternating self/cross
        self.num_heads = num_heads
        self.sinkhorn_iterations = sinkhorn_iterations
        self.match_threshold = float(match_threshold)

    def _key(self):
        return (type(self), self.descriptor_dim, tuple(self.kenc_channels),
                self.gnn_layers, self.num_heads, self.sinkhorn_iterations,
                self.match_threshold, self.precision)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, SuperGlue) and self._key() == other._key()

    def init(self, rng=0) -> dict:
        """Random init via host numpy (see LightGlue.init for why)."""
        d = self.descriptor_dim
        seed = rng if isinstance(rng, int) else int(
            np.asarray(jax.random.key_data(rng)).ravel()[-1])
        npr = np.random.default_rng(seed)

        def lin(din, dout):
            return {"kernel": jnp.asarray(
                npr.normal(size=(din, dout)) / np.sqrt(din), jnp.float32),
                "bias": jnp.zeros((dout,))}

        def mlp(channels, bn=True):
            out = []
            for i in range(1, len(channels)):
                layer = {"dense": lin(channels[i - 1], channels[i])}
                if bn and i < len(channels) - 1:
                    layer["bn"] = {
                        "scale": jnp.ones((channels[i],)),
                        "bias": jnp.zeros((channels[i],)),
                        "mean": jnp.zeros((channels[i],)),
                        "var": jnp.ones((channels[i],)),
                    }
                out.append(layer)
            return out

        params = {
            "kenc": mlp(self.kenc_channels),
            "gnn": [],
            "final_proj": lin(d, d),
            "bin_score": 1.0,
        }
        for _ in range(self.gnn_layers):
            params["gnn"].append({
                "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                "merge": lin(d, d),
                "mlp": mlp([2 * d, 2 * d, d]),
            })
        return params

    @partial(jax.jit, static_argnums=0)
    def match(self, params: dict, data: dict) -> dict:
        with jax.default_matmul_precision(self.precision):
            return self._match(params, data)

    def _match(self, params: dict, data: dict) -> dict:
        mask0, mask1 = data["mask0"], data["mask1"]
        kn0 = normalize_keypoints(data["kpts0"], data["size0"])
        kn1 = normalize_keypoints(data["kpts1"], data["size1"])
        d0 = data["desc0"] + keypoint_encoder(params["kenc"], kn0,
                                              data["scores0"])
        d1 = data["desc1"] + keypoint_encoder(params["kenc"], kn1,
                                              data["scores1"])

        # lax.scan over (self, cross) layer pairs: 9x smaller HLO than the
        # reference's unrolled 18-layer loop (superglue.py:272-279); the
        # layers alternate self (even) / cross (odd) attention.
        assert self.gnn_layers % 2 == 0, "gnn layers must alternate in pairs"
        nh = self.num_heads
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["gnn"])
        paired = jax.tree.map(
            lambda a: a.reshape((self.gnn_layers // 2, 2) + a.shape[1:]),
            stacked)

        def body(carry, pair):
            c0, c1 = carry
            sl = jax.tree.map(lambda a: a[0], pair)
            c0 = c0 + _attn_propagation(sl, c0, c0, mask0, nh)
            c1 = c1 + _attn_propagation(sl, c1, c1, mask1, nh)
            cl = jax.tree.map(lambda a: a[1], pair)
            delta0 = _attn_propagation(cl, c0, c1, mask1, nh)
            delta1 = _attn_propagation(cl, c1, c0, mask0, nh)
            return (c0 + delta0, c1 + delta1), None

        (d0, d1), _ = jax.lax.scan(body, (d0, d1), paired)

        md0 = _linear(params["final_proj"], d0)
        md1 = _linear(params["final_proj"], d1)
        sim = jnp.einsum("bmd,bnd->bmn", md0, md1,
                         preferred_element_type=jnp.float32)
        sim = sim / self.descriptor_dim ** 0.5

        scores = log_optimal_transport(
            sim, jnp.asarray(params["bin_score"], sim.dtype),
            self.sinkhorn_iterations, mask0, mask1)

        matches0, matches1, ms0, ms1 = filter_matches(
            scores, self.match_threshold)
        return {
            "matches0": jnp.where(mask0, matches0, -1),
            "matches1": jnp.where(mask1, matches1, -1),
            "mscores0": jnp.where(mask0, ms0, 0.0),
            "mscores1": jnp.where(mask1, ms1, 0.0),
            "log_assignment": scores,
        }


def superglue_init(rng=None, **kwargs) -> tuple[SuperGlue, dict]:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = SuperGlue(**kwargs)
    return model, model.init(rng)
