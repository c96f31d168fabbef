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

Production shape handling: `make_crf` is LRU-cached and supports exact
valid-region masking (`masked=True`), so varying VOC image shapes are padded
to a small set of bucket shapes (one XLA program per bucket — remote compiles
take minutes) while computing EXACTLY the unpadded result on the valid
region: the symmetric normalization is built from the valid mask instead of
ones, so padded pixels neither send nor receive messages. `batch=True`
vectorizes over a leading unary axis that shares one image (aff_prepare's
5-alpha sweep: the Nystrom features and kernel factors are computed once).
"""

from __future__ import annotations

import functools
import threading

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


def _lowrank_bilateral_factory(
    image_hw, sxy_bilateral, srgb, n_landmarks, ridge, img, mask, valid_hw, mc
):
    """Build the scatter-free low-rank bilateral operator for one image.

    k_bilateral(i,j) = k_xy(i,j) * k_rgb(ci,cj) factorizes; each factor is
    approximated by a low-rank symmetric expansion that turns the message
    pass into dense matmuls:

    * color: Nystrom — k_rgb(ci,cj) ~= psi(ci)^T psi(cj) with
      psi = (K_ZZ + ridge I)^(-1/2) k(Z, c) over M landmark colors Z taken
      at the cell centers of a 2-D stratified grid over the VALID region of
      the image itself (exact for colors in the landmark span; measured
      better and M-monotone vs raster-order index sampling — 98.4% vs 97.1%
      argmax agreement with the dense oracle on a full-palette image at
      M=224, srgb=13);
    * space: the 1-D Gaussian kernel matrices SVD-factored at tol 1e-4
      (near-exact; a wide Gaussian is numerically low-rank).

    message(v) = sum_m psi_m .* G_y G_x (psi_m .* v), chunked over m so the
    (H, W, mc, L) intermediate bounds memory. Everything lowers to MXU
    matmuls + elementwise VPU work — no scatter/gather at all.
    """
    h, w = image_hw
    uy, vy = (jnp.asarray(a) for a in _gauss_lowrank_np(h, sxy_bilateral))
    ux, vx = (jnp.asarray(a) for a in _gauss_lowrank_np(w, sxy_bilateral))

    colors = img.astype(jnp.float32) / srgb  # (H, W, 3)
    vh, vw = valid_hw[0], valid_hw[1]
    # 2-D stratified landmark sampling: cell centers of a gy x gx grid over
    # the valid region
    gy = int(np.floor(np.sqrt(n_landmarks)))
    gx = -(-n_landmarks // gy)
    k = jnp.arange(n_landmarks)
    ly = ((k // gx) * 2 + 1) * vh // (2 * gy)
    lx = ((k % gx) * 2 + 1) * vw // (2 * gx)
    z = colors[ly, lx]  # (M, 3) landmark colors
    kzz = jnp.exp(-0.5 * ((z[:, None] - z[None]) ** 2).sum(-1))
    evals, evecs = jnp.linalg.eigh(kzz + ridge * jnp.eye(n_landmarks))
    inv_sqrt = (evecs * jax.lax.rsqrt(jnp.maximum(evals, ridge))) @ evecs.T
    kzc = jnp.exp(-0.5 * ((z[:, None, None] - colors[None]) ** 2).sum(-1))
    psi = jnp.einsum("mn,nhw->hwm", inv_sqrt, kzc)  # (H, W, M)

    def bilateral(v):  # (H, W, C) -> (H, W, C)
        out = jnp.zeros_like(v)
        for c0 in range(0, n_landmarks, mc):
            cc = psi[..., c0 : c0 + mc]
            x = cc[..., :, None] * v[..., None, :]  # (H, W, mc, C)
            f = jnp.einsum("hr,hwmc->rwmc", vy, x)
            f = jnp.einsum("ws,rwmc->rsmc", vx, f)
            f = jnp.einsum("hr,rsmc->hsmc", uy, f)
            f = jnp.einsum("ws,hsmc->hwmc", ux, f)
            out = out + jnp.einsum("hwmc,hwm->hwc", f, cc)
        return out

    return bilateral


def _grid_bilateral_factory(
    image_hw, sxy_bilateral, srgb, max_color_bins, img, mask, valid_hw, mc
):
    """Build the bilateral-grid operator for one image (mc unused)."""
    h, w = image_hw
    srgb_eff = max(srgb, 255.0 / max_color_bins)
    gx = int(np.ceil((w - 1) / sxy_bilateral)) + 2
    gy = int(np.ceil((h - 1) / sxy_bilateral)) + 2
    gc = int(np.ceil(255.0 / srgb_eff)) + 2
    grid_shape = (gy, gx, gc, gc, gc)

    ys, xs = np.mgrid[0:h, 0:w]
    spatial = np.stack(
        [ys / sxy_bilateral, xs / sxy_bilateral], axis=-1
    ).reshape(-1, 2).astype(np.float32)
    feats = jnp.concatenate(
        [jnp.asarray(spatial), img.reshape(-1, 3).astype(jnp.float32) / srgb_eff],
        axis=1,
    )

    def bilateral(v):  # (H, W, C) -> (H, W, C)
        c = v.shape[-1]
        return _bilateral_grid_filter(v.reshape(-1, c), feats, grid_shape).reshape(
            h, w, c
        )

    return bilateral


def _make_crf(
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
    batch: bool = False,
    masked: bool = False,
    unary_mode: str = "energy",
    gt_prob: float = 0.7,
):
    """Build a jitted CRF for a fixed (padded) image size. LRU-cached: the
    same parameterization reuses the same compiled program.

    fn(unary (H, W, L) energies, img (H, W, 3) float 0..255) -> (H, W, L) Q
    masked=True  — fn additionally takes valid_hw=(vh, vw); pixels outside
                   the top-left valid rectangle neither send nor receive
                   messages (symmetric normalization built from the valid
                   mask), so the valid region equals the unpadded result and
                   one compiled bucket shape serves many image shapes.
    batch=True   — unary carries a leading axis (A, H, W, L) sharing ONE
                   image: color features / kernel factors are computed once,
                   the mean-field loop is vmapped over A (aff_prepare's
                   alpha sweep). The landmark chunk is capped near A*mc=160
                   to bound the (A, H, W, mc, L) intermediate (measured on
                   chip: 42 ms/alpha at A=5/mc=32 vs 86 ms/alpha as five
                   separate dispatches — the alphas share the color
                   features AND the batched matmuls fill the MXU better).
    unary_mode="label" — fn takes integer label maps (..., H, W) instead of
                   energies; the pydensecrf unary_from_labels energies (via
                   `gt_prob`, no unlabeled class) are built ON DEVICE, so
                   the host->device transfer is uint8 labels (~1/84th of the
                   float energies — the axon relay moves MB/s).

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
        factory = functools.partial(
            _lowrank_bilateral_factory, (h, w), sxy_bilateral, srgb,
            n_landmarks, ridge,
        )
        # Nystrom + SVD truncation can leave tiny negative values where the
        # kernel mass is ~0; clamp before the rsqrt normalization
        clamp = lambda x: jnp.maximum(x, 1e-6)  # noqa: E731
    elif method == "grid":
        factory = functools.partial(
            _grid_bilateral_factory, (h, w), sxy_bilateral, srgb, max_color_bins,
        )
        clamp = lambda x: x + 1e-20  # noqa: E731
    else:
        raise ValueError(f"unknown CRF method: {method}")

    def core(unary, img, valid_hw, mc):
        vh, vw = valid_hw[0], valid_hw[1]
        mask = (
            (jnp.arange(h)[:, None] < vh) & (jnp.arange(w)[None, :] < vw)
        )[..., None].astype(jnp.float32)
        bilateral = factory(img, mask, valid_hw, mc)
        # symmetric normalization over VALID pixels only (mask == ones when
        # unmasked); folding the mask into the norms both zeroes padded
        # inputs before the kernel and padded outputs after it
        norm_g = mask * jax.lax.rsqrt(
            _gaussian_filter(mask, sxy_gaussian) + 1e-20
        )
        norm_b = mask * jax.lax.rsqrt(clamp(bilateral(mask)))

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

    def wrap(unary, img, valid_hw):
        vhw = jnp.asarray(valid_hw, jnp.int32)
        if unary_mode == "label":
            p_e, n_e = -np.log(gt_prob), -np.log((1.0 - gt_prob) / (n_labels - 1))
            onehot = jax.nn.one_hot(unary.astype(jnp.int32), n_labels, dtype=jnp.float32)
            unary = n_e + (p_e - n_e) * onehot
        if batch:
            # keep the vmapped (A, H, W, mc, L) intermediate bounded without
            # starving the MXU: measured on chip at 384x512x21 A=5, t=10
            # (masked label-mode program, resident inputs, scalar-sync) —
            # mc=16: 244 ms, mc=32: 209 ms, mc=56: 618 ms, mc=112: 647 ms
            # per sweep (HBM pressure past 32; mc=224 OOMs at 18.5 GB). Cap
            # A*mc near the measured knee so larger sweeps shrink the chunk.
            mc = min(m_chunk, max(16, 160 // max(1, unary.shape[0])))
            return jax.vmap(lambda u: core(u, img, vhw, mc))(unary)
        return core(unary, img, vhw, m_chunk)

    if masked:
        return jax.jit(wrap)
    return jax.jit(lambda unary, img: wrap(unary, img, (h, w)))


_make_crf_cached = functools.lru_cache(maxsize=32)(_make_crf)
_make_crf_lock = threading.Lock()


@functools.wraps(_make_crf)
def make_crf(*args, **kwargs):
    # Serialize cache misses: callers fan out over host threads (aff_prepare's
    # pipeline pool), and lru_cache does not lock misses — without this, the
    # first few same-bucket images would each build and remote-compile a
    # duplicate of the same program.
    with _make_crf_lock:
        return _make_crf_cached(*args, **kwargs)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def crf_labels_tpu(
    img: np.ndarray, labels: np.ndarray, t: int = 10, n_labels: int = 21,
    gt_prob: float = 0.7, bucket: int = 64, **kw,
) -> np.ndarray:
    """Label-unary CRF on TPU; same contract as
    ops.densecrf.crf_inference_labels (returns (L, H, W)).

    Shapes are padded up to `bucket` multiples and run through the cached
    masked CRF, so a whole VOC-sized corpus compiles only a handful of
    bucket programs while each image gets its exact unpadded result."""
    return crf_labels_tpu_batch(
        img, labels[None], t=t, n_labels=n_labels, gt_prob=gt_prob,
        bucket=bucket, **kw,
    )[0]


def crf_labels_tpu_batch(
    img: np.ndarray, labels: np.ndarray, t: int = 10, n_labels: int = 21,
    gt_prob: float = 0.7, bucket: int = 64, **kw,
) -> np.ndarray:
    """Label-unary CRF for A labelings of ONE image (aff_prepare's alpha
    sweep: same image, per-alpha argmax seeds). labels (A, H, W) ->
    (A, L, H, W). The image's color features are computed once; the
    mean-field loop runs vmapped over A."""
    a, h, w = labels.shape
    hp, wp = _round_up(h, bucket), _round_up(w, bucket)
    labels_p = np.zeros((a, hp, wp), np.uint8)
    labels_p[:, :h, :w] = labels
    img_p = np.zeros((hp, wp, 3), np.uint8)
    img_p[:h, :w] = img
    run = make_crf(
        (hp, wp), n_labels=n_labels, t=t, batch=True, masked=True,
        unary_mode="label", gt_prob=gt_prob, **kw,
    )
    q = np.asarray(run(jnp.asarray(labels_p), jnp.asarray(img_p), (h, w)))
    return np.ascontiguousarray(np.transpose(q[:, :h, :w], (0, 3, 1, 2)))

def crf_softmax_tpu(
    img: np.ndarray, probs: np.ndarray, t: int = 10, n_labels: int = 21,
    bucket: int = 64, **kw,
) -> np.ndarray:
    """Softmax-unary CRF on TPU; same contract as
    ops.densecrf.crf_inference_softmax (probs (L, H, W) -> (L, H, W)).

    Unary energies are -log(prob) (pydensecrf unary_from_softmax). Padded
    pixels carry zero energies and — because the masked program's symmetric
    normalization is built from the valid mask — neither send nor receive
    messages, so the valid crop is exactly the unpadded result."""
    l, h, w = probs.shape
    hp, wp = _round_up(h, bucket), _round_up(w, bucket)
    unary_p = np.zeros((hp, wp, l), np.float32)
    unary_p[:h, :w] = -np.log(
        np.clip(np.transpose(probs, (1, 2, 0)), 1e-8, None)
    )
    img_p = np.zeros((hp, wp, 3), np.uint8)
    img_p[:h, :w] = img
    run = make_crf((hp, wp), n_labels=n_labels, t=t, masked=True, **kw)
    q = np.asarray(run(jnp.asarray(unary_p), jnp.asarray(img_p), (h, w)))
    return np.ascontiguousarray(np.transpose(q[:h, :w], (2, 0, 1)))


def dense_crf_tpu(
    probs: np.ndarray, img: np.ndarray, n_classes: int = 21, n_iters: int = 1,
    scale_factor: float = 1,
) -> np.ndarray:
    """TPU twin of ops.densecrf.dense_crf — the stage-3 test-time CRF
    (segmentation/lib/utils/DenseCRF.py:5-39: softmax unary, Gaussian
    sxy3/compat3, bilateral sxy32/srgb13/compat10, one iteration)."""
    return crf_softmax_tpu(
        img, probs, t=n_iters, n_labels=n_classes,
        sxy_gaussian=3 / scale_factor, compat_gaussian=3,
        sxy_bilateral=32 / scale_factor, srgb=13, compat_bilateral=10,
    )
