"""Bilinear resize / pooling with torch-compatible semantics, TPU-first.

The reference relies on `F.interpolate(..., mode='bilinear')` with both
`align_corners=True` (train path, e.g. contrast_train.py:131-134,
network/resnet38_contrast.py:52,57-59) and `align_corners=False`
(contrast_infer.py:62). `jax.image.resize` implements neither exactly, so we
build the (out, in) interpolation matrices explicitly and apply them as two
dense matmuls — separable along H and W. On TPU this maps straight onto the
MXU and XLA fuses the surrounding elementwise work; it is also exactly
differentiable (the transpose matmul is the VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _resize_weights_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear-interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    elif align_corners:  # out_size == 1
        src = np.zeros((1,), dtype=np.float64)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        # torch clamps the source coordinate into the valid range, which for
        # bilinear is equivalent to clamping the gather indices
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


def resize_weights(in_size: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    return jnp.asarray(_resize_weights_np(int(in_size), int(out_size), bool(align_corners)))


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], align_corners: bool = True) -> jax.Array:
    """Bilinear-resize the two spatial dims of an NHWC (or HWC / NCHW-free)
    array to `out_hw`.

    Accepts rank-3 `(H, W, C)` or rank-4 `(N, H, W, C)` arrays; spatial dims
    are always the two before the channel dim.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    wh = resize_weights(h, oh, align_corners)
    ww = resize_weights(w, ow, align_corners)
    dtype = x.dtype
    y = jnp.einsum("oh,nhwc->nowc", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,nhwc->nhpc", ww, y)
    y = y.astype(dtype)
    return y[0] if squeeze else y


@functools.lru_cache(maxsize=256)
def _composed_weights_np(
    in_size: int, mid_size: int, out_size: int, ac1: bool, ac2: bool
) -> np.ndarray:
    """(out, in) matrix of resize(in->mid, ac1) followed by resize(mid->out,
    ac2), precomposed: bilinear resize is linear, so W = W2 @ W1 applies both
    steps in ONE matmul — identical operator, no mid-size intermediate. The
    CAM chain (stride-8 -> view size (ac=True) -> original (ac=False)) would
    otherwise materialize a view-size tensor that at scale 2 is 4x the output."""
    w1 = _resize_weights_np(in_size, mid_size, ac1).astype(np.float64)
    w2 = _resize_weights_np(mid_size, out_size, ac2).astype(np.float64)
    return (w2 @ w1).astype(np.float32)


def resize_bilinear_chain(
    x: jax.Array, mid_hw: tuple[int, int], out_hw: tuple[int, int],
    align1: bool = True, align2: bool = False,
) -> jax.Array:
    """resize(resize(x, mid_hw, align1), out_hw, align2) as one composed
    resize (exact same linear map, reassociated)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    mh, mw = int(mid_hw[0]), int(mid_hw[1])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    wh = jnp.asarray(_composed_weights_np(h, mh, oh, align1, align2))
    ww = jnp.asarray(_composed_weights_np(w, mw, ow, align1, align2))
    dtype = x.dtype
    y = jnp.einsum("oh,nhwc->nowc", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,nhwc->nhpc", ww, y)
    return (y[0] if squeeze else y).astype(dtype)


def _valid_linear_weights(
    valid_in: jax.Array, valid_out: jax.Array, in_size: int, out_size: int,
    align_corners: bool,
) -> jax.Array:
    """(N, out_size, in_size) per-sample bilinear weight matrices for
    dynamically sized valid regions inside statically padded buffers.

    For sample n only rows < valid_out[n] and cols < valid_in[n] are nonzero;
    within that block the weights equal `_resize_weights_np(valid_in[n],
    valid_out[n], align_corners)`. Built with iota arithmetic so one compiled
    program serves every valid size in a bucket."""
    vi = valid_in.astype(jnp.float32)[:, None]  # (N, 1)
    vo = valid_out.astype(jnp.float32)[:, None]
    o = jnp.arange(out_size, dtype=jnp.float32)[None]  # (1, O)
    if align_corners:
        src = o * (vi - 1.0) / jnp.maximum(vo - 1.0, 1.0)
        src = jnp.where(vo > 1.0, src, 0.0)
    else:
        src = (o + 0.5) * (vi / vo) - 0.5
    src = jnp.clip(src, 0.0, vi - 1.0)  # (N, O)
    i = jnp.arange(in_size, dtype=jnp.float32)[None, None]  # (1, 1, I)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i - src[:, :, None]))  # (N, O, I) tent
    w = w * (i < vi[:, :, None])  # cols beyond valid_in
    w = w * (o[..., None] < vo[:, :, None])  # rows beyond valid_out
    return w


def resize_bilinear_valid(
    x: jax.Array, out_hw: tuple[int, int], valid_in: jax.Array,
    valid_out: jax.Array, align_corners: bool = True,
) -> jax.Array:
    """Per-sample valid-region bilinear resize inside padded buffers.

    x: (N, H, W, C) where sample n's content lives in x[n, :valid_in[n, 0],
    :valid_in[n, 1]] and the rest is padding. Returns (N, *out_hw, C) where
    each sample's [:valid_out[n, 0], :valid_out[n, 1]] block equals
    `resize_bilinear` of its valid region, and everything else is zero —
    the bucketed-inference equivalent of resizing each exact-shape image."""
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    wh = _valid_linear_weights(valid_in[:, 0], valid_out[:, 0], h, oh, align_corners)
    ww = _valid_linear_weights(valid_in[:, 1], valid_out[:, 1], w, ow, align_corners)
    dtype = x.dtype
    y = jnp.einsum("noh,nhwc->nowc", wh, x.astype(jnp.float32))
    y = jnp.einsum("npw,nhwc->nhpc", ww, y)
    return y.astype(dtype)


@functools.lru_cache(maxsize=256)
def _bicubic_weights_np(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) PIL.Image.BICUBIC-equivalent resampling matrix: Keys cubic
    (a = -0.5) with PIL's antialiasing (filter support scaled by the
    downscale factor) and per-row weight normalization. Matches
    `img.resize(..., resample=PIL.Image.BICUBIC)` up to uint8 rounding —
    the device-side version of the MSF view scaling (voc12/data.py:103-110).
    """

    def cubic(x):
        x = np.abs(x)
        a = -0.5
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = 2.0 * fscale
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(np.floor(center - support)), 0)
        hi = min(int(np.ceil(center + support)), in_size)
        js = np.arange(lo, hi)
        ws = cubic((js + 0.5 - center) / fscale)
        s = ws.sum()
        if s != 0:
            w[i, lo:hi] = ws / s
    return w.astype(np.float32)


def resize_bicubic(
    x: jax.Array, out_hw: tuple[int, int], uint8_rounding: bool = True
) -> jax.Array:
    """PIL-BICUBIC-equivalent resize of NHWC / HWC spatial dims (antialiased
    on downscale), as two dense matmuls. `uint8_rounding=True` reproduces
    PIL's horizontal-then-vertical pass order with the intermediate clipped
    and rounded to uint8, matching `Image.resize` to ~0.3/255 mean error
    (PIL additionally quantizes filter weights to fixed point, so exact bit
    parity is not attainable). Returns float32 in 0..255 units."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        y = x.astype(jnp.float32)
        return y[0] if squeeze else y
    wh = jnp.asarray(_bicubic_weights_np(h, oh))
    ww = jnp.asarray(_bicubic_weights_np(w, ow))
    y = jnp.einsum("pw,nhwc->nhpc", ww, x.astype(jnp.float32))  # horizontal
    if uint8_rounding:
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    y = jnp.einsum("oh,nhwc->nowc", wh, y)  # vertical
    if uint8_rounding:
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    return y[0] if squeeze else y


def avg_pool2d(x: jax.Array, ksize: int) -> jax.Array:
    """Non-overlapping kxk average pool over NHWC / HWC spatial dims.

    Matches `F.avg_pool2d(x, k, k)` (aff_infer.py:113) and the dataset-side
    `skimage.measure.block_reduce` mean pool (tool/imutils.py:130-138) when
    the input is divisible by k (callers pad to multiples of 8 first).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    assert h % ksize == 0 and w % ksize == 0, (h, w, ksize)
    y = x.reshape(n, h // ksize, ksize, w // ksize, ksize, c).mean(axis=(2, 4))
    return y[0] if squeeze else y
