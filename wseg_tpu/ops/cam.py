"""CAM normalization / fusion ops (NHWC layout).

TPU-native equivalents of:
* `tool/visualization.py:54-83` (`max_norm`)
* `contrast_train.py:28-32` (`max_onehot`)
* `network/resnet38_contrast.py:41-48` (detached CAM max-norm + bg completion
  + per-pixel fg argmax masking feeding PCM)
* `contrast_infer.py:75-80` (multi-scale+flip CAM sum + min/max normalization)

All functions are pure, static-shape, jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_norm(p: jax.Array, e: float = 1e-5) -> jax.Array:
    """Per-(sample, class) min/max CAM normalization.

    `p`: (N, H, W, C). relu, then `relu(p - min - e) / (max - min + e)` with
    min/max taken over the spatial dims (tool/visualization.py:62-67).
    """
    p = jax.nn.relu(p)
    n, h, w, c = p.shape
    flat = p.reshape(n, h * w, c)
    max_v = flat.max(axis=1)[:, None, None, :]
    min_v = flat.min(axis=1)[:, None, None, :]
    return jax.nn.relu(p - min_v - e) / (max_v - min_v + e)


def max_onehot(x: jax.Array) -> jax.Array:
    """Zero out foreground channels that are not the per-pixel fg max
    (contrast_train.py:28-32). `x`: (N, H, W, C) with channel 0 = background.
    """
    fg = x[..., 1:]
    fg_max = fg.max(axis=-1, keepdims=True)
    fg = jnp.where(fg < fg_max, 0.0, fg)
    return jnp.concatenate([x[..., :1], fg], axis=-1)


def cam_bg_complete(cam_d: jax.Array, e: float = 1e-5, mask=None) -> jax.Array:
    """Detached-CAM normalization used to seed PCM
    (network/resnet38_contrast.py:41-48).

    `cam_d`: raw (N, H, W, 21) CAM logits. Per class: relu, divide by spatial
    max (+e); background channel becomes `1 - max(fg)`; fg channels keep only
    the per-pixel argmax. `mask` (N, H, W, 1) restricts the spatial max to
    each sample's valid region and zeroes the output pad halo (bucketed
    inference; relu'd values are >= 0 so masked max is exact).
    """
    cam_d = jax.nn.relu(cam_d)
    if mask is not None:
        cam_d = cam_d * mask
    n, h, w, c = cam_d.shape
    cam_max = cam_d.reshape(n, h * w, c).max(axis=1)[:, None, None, :] + e
    cam_norm = jax.nn.relu(cam_d - e) / cam_max
    fg = cam_norm[..., 1:]
    bg = 1.0 - fg.max(axis=-1, keepdims=True)
    fg_max = fg.max(axis=-1, keepdims=True)
    fg = jnp.where(fg < fg_max, 0.0, fg)
    out = jnp.concatenate([bg, fg], axis=-1)
    if mask is not None:
        out = out * mask
    return out


def fuse_msf_cams(cam_sum: jax.Array, e: float = 1e-5) -> jax.Array:
    """Fuse a summed multi-scale+flip CAM stack into the normalized CAM
    (contrast_infer.py:75-80).

    `cam_sum`: (C, H, W) summed over the 8 views (already flipped back).
    Returns (C, H, W) in [0, 1].
    """
    cam_sum = jnp.maximum(cam_sum, 0.0)
    cam_max = cam_sum.max(axis=(1, 2), keepdims=True)
    cam_min = cam_sum.min(axis=(1, 2), keepdims=True)
    cam_sum = jnp.where(cam_sum < cam_min + e, 0.0, cam_sum)
    return (cam_sum - cam_min - e) / (cam_max - cam_min + e)
