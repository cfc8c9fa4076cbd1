"""Device-side image ops: grayscale, pyramids, resize, tiling, warping.

TPU-native replacement for the reference's host OpenCV preprocessing:

  * quality resize via cv2.pyrUp/pyrDown    (ref matching/matchers.py:583-610)
  * grid tiling with overlap                (ref matching/tiling.py:7-187)
  * homography warping                      (ref utils/homography.py:10-51)
  * cv2.undistort image equivalent          (ref core/images.py undistort_image)

Everything here is statically shaped and jit/vmap friendly: tiles are an
extracted batch (T, th, tw, C) produced by vmapped dynamic slices, so a
whole tile grid feeds the matcher as ONE batched forward pass on the MXU
instead of the reference's per-tile python loop (matchers.py:367).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# ITU-R BT.601 luma weights — matches cv2.cvtColor(..., COLOR_RGB2GRAY).
# Host numpy constants: module-level jnp.array ran eager device ops at
# import (jit embeds numpy constants identically).
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)

# cv2.pyrDown/pyrUp 5-tap Gaussian kernel (1,4,6,4,1)/16.
_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def rgb_to_gray(image: Array) -> Array:
    """(..., H, W, 3) float -> (..., H, W) luma. uint8 input is scaled to [0,1]."""
    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img / 255.0
    return img @ _LUMA


def _sep_conv5(img: Array, kernel: Array) -> Array:
    """Separable 5-tap filter with reflect padding on (H, W) or (H, W, C)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    kh = kernel.reshape(1, 1, 5, 1)
    kw = kernel.reshape(1, 1, 1, 5)
    x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)), mode="reflect")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    out = x[:, 0].transpose(1, 2, 0)
    return out[..., 0] if squeeze else out


def pyr_down(image: Array) -> Array:
    """Gaussian blur + 2x decimation (cv2.pyrDown semantics)."""
    img = image.astype(jnp.float32)
    return _sep_conv5(img, _GAUSS5)[::2, ::2]


def pyr_up(image: Array) -> Array:
    """2x zero-stuffed upsample + 4*Gaussian smoothing (cv2.pyrUp semantics)."""
    img = image.astype(jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    up = jnp.zeros((2 * h, 2 * w, c), jnp.float32)
    up = up.at[::2, ::2].set(img)
    out = _sep_conv5(up, _GAUSS5 * 2.0)
    return out[..., 0] if squeeze else out


def resize(image: Array, shape: tuple[int, int], method: str = "bilinear") -> Array:
    """Resize (H, W[, C]) to `shape`=(h, w)."""
    out_shape = tuple(shape) + image.shape[2:]
    return jax.image.resize(image.astype(jnp.float32), out_shape, method=method)


def quality_resize(image: Array, quality: str) -> Array:
    """Reference Quality ladder (matchers.py:583-610):
    highest=pyrUp x1, high=identity, medium=pyrDown x1, low=pyrDown x2."""
    q = quality.lower()
    if q == "highest":
        return pyr_up(image)
    if q == "high":
        return image.astype(jnp.float32)
    if q == "medium":
        return pyr_down(image)
    if q == "low":
        return pyr_down(pyr_down(image))
    raise ValueError(f"unknown quality {quality!r}")


# ---------------------------------------------------------------------------
# Tiling
# ---------------------------------------------------------------------------

def compute_tile_limits(
    h: int, w: int, grid: tuple[int, int], overlap: int = 0,
) -> np.ndarray:
    """Static tile origins+sizes for a (rows, cols) grid with overlap.

    Mirrors Tiler.compute_limits_by_grid (ref matching/tiling.py:93-130,
    steps rounded down to a multiple of 10 px) but returns a single
    uniform tile size so tile batches are statically shaped:
    returns int array (rows*cols, 4) of [x0, y0, tw, th].
    """
    rows, cols = grid
    dx = (w // cols) // 10 * 10
    dy = (h // rows) // 10 * 10
    tw = min(dx + 2 * overlap, w)
    th = min(dy + 2 * overlap, h)
    lims = []
    for r in range(rows):
        for c in range(cols):
            # pin the last row/column to the image edge: the 10-px step
            # rounding would otherwise leave an uncovered strip where
            # features could never be detected or tracked
            x0 = w - tw if c == cols - 1 else \
                min(max(c * dx - overlap, 0), w - tw)
            y0 = h - th if r == rows - 1 else \
                min(max(r * dy - overlap, 0), h - th)
            lims.append([x0, y0, tw, th])
    return np.asarray(lims, np.int32)


@partial(jax.jit, static_argnames=("tile_h", "tile_w"))
def extract_tiles(image: Array, origins: Array, tile_h: int, tile_w: int) -> Array:
    """Batched static-shape tile gather.

    image: (H, W[, C]); origins: (T, 2) int [x0, y0] -> (T, th, tw[, C]).
    One vmapped dynamic_slice; the tile batch then rides a single
    batched matcher forward instead of a python tile loop.
    """
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    c = img.shape[-1]

    def one(origin):
        return jax.lax.dynamic_slice(
            img, (origin[1], origin[0], 0), (tile_h, tile_w, c)
        )

    tiles = jax.vmap(one)(origins)
    return tiles[..., 0] if squeeze else tiles


# ---------------------------------------------------------------------------
# Warping / sampling
# ---------------------------------------------------------------------------

def bilinear_sample(image: Array, xy: Array, pad_value: float = 0.0) -> Array:
    """Sample (H, W[, C]) at float pixel coords xy (N, 2) -> (N[, C]).

    Out-of-bounds coordinates return pad_value (cv2 BORDER_CONSTANT).
    """
    squeeze = image.ndim == 2
    img = (image[..., None] if squeeze else image).astype(jnp.float32)
    h, w, _ = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, pad_value)

    v00 = tap(x0i, y0i)
    v10 = tap(x0i + 1, y0i)
    v01 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out[..., 0] if squeeze else out


def _pixel_grid(h: int, w: int) -> Array:
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    return jnp.stack([xx, yy], -1).reshape(-1, 2)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_homography(image: Array, H: Array, out_h: int, out_w: int) -> Array:
    """Inverse-map homography warp (cv2.warpPerspective semantics):
    out(x) = image(H^-1 x). Ref utils/homography.py:10-51."""
    Hinv = jnp.linalg.inv(H)
    grid = _pixel_grid(out_h, out_w)
    ones = jnp.ones((grid.shape[0], 1), jnp.float32)
    src = (jnp.concatenate([grid, ones], -1) @ Hinv.T)
    src = src[:, :2] / jnp.maximum(jnp.abs(src[:, 2:3]), 1e-12) * jnp.sign(src[:, 2:3])
    out = bilinear_sample(image, src)
    return out.reshape((out_h, out_w) + image.shape[2:])


def undistort_image(image: Array, K: Array, dist: Array) -> Array:
    """Remove lens distortion (cv2.undistort semantics, same K on output).

    For each output pixel: normalize with K^-1, apply FORWARD distortion,
    re-project with K, sample the distorted source there.
    """
    from icepy4d_tpu.ops.geometry import distort_normalized

    h, w = image.shape[:2]
    grid = _pixel_grid(h, w)
    Kinv = jnp.linalg.inv(K.astype(jnp.float32))
    xn = (jnp.concatenate([grid, jnp.ones((grid.shape[0], 1), jnp.float32)], -1)
          @ Kinv.T)[:, :2]
    xd = distort_normalized(xn, dist)
    uv = xd @ K[:2, :2].T + K[:2, 2]
    out = bilinear_sample(image, uv)
    return out.reshape(image.shape[:2] + image.shape[2:])


def make_homography(K0: Array, R0: Array, K1: Array, R1: Array) -> Array:
    """Rotation-only homography mapping cam1 pixels into cam0's frame:
    H = K0 R0 R1^T K1^-1 (ref utils/homography.py:10-41)."""
    R = R0 @ R1.T
    return K0 @ R @ jnp.linalg.inv(K1)
