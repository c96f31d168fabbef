"""Radius-neighborhood pixel-pair machinery for AffinityNet.

TPU-native rebuild of:
* `tool/pyutils.py:125-159` (`get_indices_of_pairs`) — the static pair-index
  generator (host-side numpy; indices are compile-time constants).
* `network/resnet38_aff.py:53-78` — pairwise affinity
  `exp(-mean|f_to - f_from|)` over the pair lists, and the symmetric dense
  affinity matrix with identity diagonal.

The pair set for radius r covers the "causal half" of the disc (dy=0, dx>0
rows plus dy>0 full rows with dx^2+dy^2 < r^2), computed over a frame that is
cropped so every (from, to) pair stays in-bounds.

Instead of torch's sparse-tensor `to_dense`, the dense matrix is built with a
static scatter-add (`.at[].add`) which XLA lowers to an efficient scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def search_offsets(radius: int) -> tuple[tuple[int, int], ...]:
    """Half-disc displacement set, ordered as the reference generates it."""
    dist = []
    for x in range(1, radius):
        dist.append((0, x))
    for y in range(1, radius):
        for x in range(-radius + 1, radius):
            if x * x + y * y < radius * radius:
                dist.append((y, x))
    return tuple(dist)


@functools.lru_cache(maxsize=64)
def radius_pair_indices(radius: int, size: tuple[int, int]) -> tuple[np.ndarray, np.ndarray]:
    """(indices_from, indices_to) flat-pixel index arrays.

    indices_from: (P,) — the cropped frame, raster order.
    indices_to:   (D*P,) — for each displacement d, the shifted frame.
    """
    h, w = size
    if radius < 2:
        raise ValueError(
            f"radius {radius} yields an empty pair set; the affinity head "
            f"needs a feature map with min edge >= 5 (input min edge >= 40)"
        )
    offsets = search_offsets(radius)
    rf = radius - 1  # radius_floor
    full = np.arange(h * w, dtype=np.int64).reshape(h, w)
    crop_h = h - rf
    crop_w = w - 2 * rf
    indices_from = full[:-rf, rf:-rf].reshape(-1)
    to_list = [
        full[dy : dy + crop_h, rf + dx : rf + dx + crop_w].reshape(-1)
        for dy, dx in offsets
    ]
    return indices_from, np.concatenate(to_list, axis=0)


def pairwise_affinity(
    f: jax.Array, ind_from: jax.Array, ind_to: jax.Array
) -> jax.Array:
    """aff = exp(-mean_c |f[to] - f[from]|) for each pair.

    f: (N, HW, C) feature map flattened over pixels (NHWC order).
    ind_from: (P,), ind_to: (D*P,). Returns (N, D, P).
    """
    n, hw, c = f.shape
    p = ind_from.shape[0]
    d = ind_to.shape[0] // p
    ff = jnp.take(f, ind_from, axis=1)  # (N, P, C)
    ft = jnp.take(f, ind_to, axis=1).reshape(n, d, p, c)
    return jnp.exp(-jnp.abs(ft - ff[:, None]).mean(axis=-1))


def pairwise_affinity_sliced(f_nhwc: jax.Array, radius: int) -> jax.Array:
    """Slice-based equivalent of `pairwise_affinity` — identical output
    (tests/test_pcm_pairs.py asserts exact equality).

    The gather formulation materializes the (N, D, P, C) `f[ind_to]` temp in
    HBM (9.6 GB at the stage-2 walk's measured-good b64, and the OOM wall at
    b96 — ROOFLINE.md §5d). Every displacement's `ind_to` frame is a static
    shifted window of the feature map, so the same pairs are reachable by
    `lax.slice`; XLA then fuses the subtract/abs/mean-over-C reduction into
    each slice and only (N, crop_h, crop_w) per displacement ever exists.

    f_nhwc: (N, H, W, C) feature map. Returns (N, D, P) in the same
    displacement/pixel order as `pairwise_affinity` over
    `radius_pair_indices(radius, (H, W))`.
    """
    n, h, w, c = f_nhwc.shape
    if radius < 2:
        raise ValueError(
            f"radius {radius} yields an empty pair set; the affinity head "
            f"needs a feature map with min edge >= 5 (input min edge >= 40)"
        )
    offsets = search_offsets(radius)
    rf = radius - 1
    ch, cw = h - rf, w - 2 * rf
    ff = jax.lax.slice(f_nhwc, (0, 0, rf, 0), (n, ch, rf + cw, c))
    affs = [
        jnp.exp(
            -jnp.abs(
                jax.lax.slice(
                    f_nhwc, (0, dy, rf + dx, 0), (n, dy + ch, rf + dx + cw, c)
                )
                - ff
            ).mean(axis=-1)
        )
        for dy, dx in offsets
    ]
    return jnp.stack(affs, axis=1).reshape(n, len(offsets), ch * cw)


def dense_affinity_matrix(
    aff: jax.Array, ind_from: jax.Array, ind_to: jax.Array, area: int
) -> jax.Array:
    """Symmetric (area, area) dense affinity matrix with unit diagonal
    (network/resnet38_aff.py:65-78). `aff`: (D, P) single-image affinities."""
    d, p = aff.shape
    ind_from_exp = jnp.broadcast_to(ind_from[None, :], (d, p)).reshape(-1)
    ind_to_flat = ind_to.reshape(-1)
    vals = aff.reshape(-1)
    mat = jnp.zeros((area, area), dtype=aff.dtype)
    mat = mat.at[ind_from_exp, ind_to_flat].add(vals)
    mat = mat.at[ind_to_flat, ind_from_exp].add(vals)
    mat = mat.at[jnp.arange(area), jnp.arange(area)].add(1.0)
    return mat


def dense_affinity_matrix_banded(
    aff: jax.Array, radius: int, size: tuple[int, int]
) -> jax.Array:
    """Scatter-free equivalent of `dense_affinity_matrix` (same math, same
    output — tests/test_pcm_pairs.py asserts exact equality).

    Every pair (from, to) of displacement (dy, dx) satisfies
    to - from == dy*w + dx, a CONSTANT per displacement — so the dense matrix
    is a sum of |D| diagonal bands. Each band is a broadcast+select over the
    (area, area) grid (pure VPU work XLA fuses into one pass) instead of a
    scatter-add, which TPUs serialize. Validity needs no masks beyond the
    values themselves: padding each displacement's (crop_h, crop_w) affinity
    frame back to the full (h, w) grid with zeros puts 0 at every from-pixel
    the reference's cropped frame excludes (tool/pyutils.py:135-152), and
    in-frame pairs are in-bounds by construction.
    """
    h, w = size
    area = h * w
    offsets = search_offsets(radius)
    rf = radius - 1
    crop_h, crop_w = h - rf, w - 2 * rf
    # a_pad[d, i] = affinity of the pair whose FROM pixel is flat index i
    # (the cropped frame starts at (0, rf) in the full grid)
    a_pad = jnp.pad(
        aff.reshape(-1, crop_h, crop_w), ((0, 0), (0, rf), (rf, rf))
    ).reshape(-1, area)
    delta = jnp.arange(area)[None, :] - jnp.arange(area)[:, None]  # col - row
    upper = jnp.zeros((area, area), aff.dtype)
    for d, (dy, dx) in enumerate(offsets):
        upper = upper + jnp.where(delta == dy * w + dx, a_pad[d][:, None], 0)
    return upper + upper.T + jnp.eye(area, dtype=aff.dtype)
