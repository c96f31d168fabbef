"""Exact dense mean-field CRF oracle.

The two first-party CRF backends (native permutohedral lattice in
`native/densecrf/` and the JAX bilateral-grid path in `ops/crf.py`) were
previously only cross-checked against each other; two siblings can share a
conceptual bug in the normalization or update order. This oracle is a
from-the-paper O(n^2) float64 implementation with EXPLICIT Gaussian and
bilateral kernel matrices — no lattice, no grid — of the model both claim to
implement (Krähenbühl & Koltun NIPS 2011, the pydensecrf semantics used at
`/root/reference/aff_prepare.py:34-50` and
`/root/reference/segmentation/lib/utils/DenseCRF.py:5-39`):

    K_k[i,j]   = exp(-|f_k(i) - f_k(j)|^2 / 2)      (diagonal included)
    norm_k     = (K_k 1)^(-1/2)                      (symmetric normalization)
    Q  <- softmax(-U + sum_k w_k * norm_k .* (K_k (norm_k .* Q)))
    Q_0 = softmax(-U)

Both backends must match its marginals: the lattice tightly (its only error
is the permutohedral approximation of the Gaussian), the grid boundedly with
equal argmax.
"""

import numpy as np

from wseg_tpu.ops.crf import make_crf
from wseg_tpu.ops.densecrf import _inference, unary_from_labels


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def dense_meanfield_oracle(
    img, unary, t, sxy_gaussian, compat_gaussian, sxy_bilateral, srgb,
    compat_bilateral,
):
    """img: (H, W, 3) uint8; unary: (H, W, L) energies. Returns (H, W, L) Q."""
    h, w = img.shape[:2]
    n, L = h * w, unary.shape[-1]
    ys, xs = np.mgrid[0:h, 0:w]
    pos = np.stack([xs, ys], axis=-1).reshape(n, 2).astype(np.float64)

    kernels = []
    if compat_gaussian:
        kernels.append((compat_gaussian, pos / sxy_gaussian))
    if compat_bilateral:
        fb = np.concatenate(
            [pos / sxy_bilateral, img.reshape(n, 3).astype(np.float64) / srgb],
            axis=1,
        )
        kernels.append((compat_bilateral, fb))

    mats = []
    for wgt, f in kernels:
        d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
        K = np.exp(-0.5 * d2)
        norm = 1.0 / np.sqrt(K @ np.ones(n))
        mats.append((wgt, K, norm))

    neg_u = -unary.reshape(n, L).astype(np.float64)
    q = _softmax(neg_u)
    for _ in range(t):
        msg = neg_u.copy()
        for wgt, K, norm in mats:
            msg += wgt * norm[:, None] * (K @ (norm[:, None] * q))
        q = _softmax(msg)
    return q.reshape(h, w, L)


def _scene(h=24, w=32, n_labels=3, noise=0.2):
    """Three-region color image with a noisy label seed."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 3] = (200, 40, 40)
    img[:, w // 3 : 2 * w // 3] = (40, 200, 40)
    img[:, 2 * w // 3 :] = (40, 40, 200)
    labels = np.zeros((h, w), np.uint8)
    labels[:, w // 3 : 2 * w // 3] = 1
    labels[:, 2 * w // 3 :] = 2
    rng = np.random.RandomState(0)
    noisy = labels.copy()
    flip = rng.rand(h, w) < noise
    noisy[flip] = (noisy[flip] + 1 + rng.randint(0, n_labels - 1, flip.sum())) % n_labels
    return img, noisy


PARAMS = dict(sxy_gaussian=3.0, compat_gaussian=3.0,
              sxy_bilateral=10.0, srgb=40.0, compat_bilateral=10.0)


def test_native_lattice_matches_dense_oracle():
    """Full mean-field loop, both kernels: the C++ path's only deviation from
    the exact dense model must be the permutohedral filter approximation."""
    img, noisy = _scene()
    h, w = noisy.shape
    unary = unary_from_labels(noisy, 3, gt_prob=0.7).reshape(h, w, 3)
    t = 10
    want = dense_meanfield_oracle(img, unary, t, **PARAMS)
    got = _inference(
        np.ascontiguousarray(unary.reshape(-1, 3)),
        np.ascontiguousarray(img), t,
        PARAMS["sxy_gaussian"], PARAMS["compat_gaussian"],
        PARAMS["sxy_bilateral"], PARAMS["srgb"], PARAMS["compat_bilateral"],
        h, w, 3,
    ).reshape(h, w, 3)
    assert (got.argmax(-1) == want.argmax(-1)).all()
    err = np.abs(got - want)
    assert err.mean() < 5e-3, err.mean()
    assert err.max() < 0.08, err.max()


def test_native_lattice_gaussian_only_matches_oracle():
    """Gaussian-kernel-only loop isolates the 2-D lattice (best-case filter
    accuracy) — catches any normalization/update-order bug with a tighter
    bound than the 5-D bilateral case allows."""
    img, noisy = _scene()
    h, w = noisy.shape
    unary = unary_from_labels(noisy, 3, gt_prob=0.7).reshape(h, w, 3)
    t = 5
    want = dense_meanfield_oracle(
        img, unary, t, sxy_gaussian=3.0, compat_gaussian=3.0,
        sxy_bilateral=10.0, srgb=40.0, compat_bilateral=0.0,
    )
    got = _inference(
        np.ascontiguousarray(unary.reshape(-1, 3)), None, t,
        3.0, 3.0, 10.0, 40.0, 0.0, h, w, 3,
    ).reshape(h, w, 3)
    assert (got.argmax(-1) == want.argmax(-1)).all()
    err = np.abs(got - want)
    assert err.mean() < 2e-3, err.mean()
    assert err.max() < 0.05, err.max()


GENTLE = dict(sxy_gaussian=3.0, compat_gaussian=0.5,
              sxy_bilateral=10.0, srgb=40.0, compat_bilateral=1.0)


def _diffuse_unary(h, w):
    """Small random logits: marginals stay far from one-hot, so the pairwise
    message term — where a normalization bug would live — stays visible
    instead of saturating away (at the production compat weights 3/10 the
    marginals are one-hot after 2 iterations and ANY normalization agrees to
    1e-5)."""
    rng = np.random.RandomState(3)
    return -(rng.randn(h, w, 3).astype(np.float64) * 0.5)


def test_native_lattice_unsaturated_regime():
    """Discriminating bound: in this regime the correct implementation
    measures mean err 2.4e-4 (pure permutohedral approximation), while a
    row-normalized (K/K1) variant measures 3.8e-4 and a diagonal-excluded
    variant 5.8e-4 — both rejected by the 3e-4 bound."""
    img, _ = _scene()
    h, w = img.shape[:2]
    unary = _diffuse_unary(h, w)
    want = dense_meanfield_oracle(img, unary, 3, **GENTLE)
    got = _inference(
        np.ascontiguousarray(unary.reshape(-1, 3), dtype=np.float32),
        np.ascontiguousarray(img), 3,
        GENTLE["sxy_gaussian"], GENTLE["compat_gaussian"],
        GENTLE["sxy_bilateral"], GENTLE["srgb"], GENTLE["compat_bilateral"],
        h, w, 3,
    ).reshape(h, w, 3)
    err = np.abs(got - want)
    assert err.mean() < 3e-4, err.mean()
    assert err.max() < 2e-3, err.max()


def test_grid_crf_unsaturated_regime():
    """Same discriminating bound for the JAX bilateral-grid path (measures
    1.9e-4 correct vs 3.8e-4+ for the bug classes above)."""
    img, _ = _scene()
    h, w = img.shape[:2]
    unary = _diffuse_unary(h, w)
    want = dense_meanfield_oracle(img, unary, 3, **GENTLE)
    run = make_crf((h, w), n_labels=3, t=3, method="grid", **GENTLE)
    got = np.asarray(run(unary.astype(np.float32), img.astype(np.float32)))
    err = np.abs(got - want)
    assert err.mean() < 3e-4, err.mean()
    assert err.max() < 2e-3, err.max()


def test_grid_crf_matches_dense_oracle():
    """The JAX bilateral-grid path against the same oracle: bounded marginal
    error and identical argmax. srgb chosen above the grid's 255/16 color-bin
    floor so the compared model is identical (ops/crf.py caps srgb_eff)."""
    img, noisy = _scene()
    h, w = noisy.shape
    unary = unary_from_labels(noisy, 3, gt_prob=0.7).reshape(h, w, 3)
    t = 10
    want = dense_meanfield_oracle(img, unary, t, **PARAMS)
    run = make_crf((h, w), n_labels=3, t=t, method="grid", **PARAMS)
    got = np.asarray(run(unary.astype(np.float32), img.astype(np.float32)))
    assert (got.argmax(-1) == want.argmax(-1)).all()
    err = np.abs(got - want)
    assert err.mean() < 0.02, err.mean()


def test_lowrank_crf_matches_dense_oracle():
    """The default (lowrank) TPU path against the oracle on the palette
    scene: the Nystrom landmarks cover the palette exactly, so the full
    10-iter loop is near-exact (measured mean 1.3e-8, max 1.5e-7)."""
    img, noisy = _scene()
    h, w = noisy.shape
    unary = unary_from_labels(noisy, 3, gt_prob=0.7).reshape(h, w, 3)
    want = dense_meanfield_oracle(img, unary, 10, **PARAMS)
    run = make_crf((h, w), n_labels=3, t=10, method="lowrank", **PARAMS)
    got = np.asarray(run(unary.astype(np.float32), img.astype(np.float32)))
    assert (got.argmax(-1) == want.argmax(-1)).all()
    err = np.abs(got - want)
    assert err.mean() < 1e-6, err.mean()
    assert err.max() < 1e-5, err.max()


def test_lowrank_crf_unsaturated_regime():
    """The discriminating (normalization-bug-rejecting) bound for the
    lowrank path — on the palette scene its only error sources are the SVD
    truncation and the ridge, measured mean 1.4e-7, far under the 3e-4
    bound that rejects row-normalized / diagonal-excluded variants."""
    img, _ = _scene()
    h, w = img.shape[:2]
    unary = _diffuse_unary(h, w)
    want = dense_meanfield_oracle(img, unary, 3, **GENTLE)
    run = make_crf((h, w), n_labels=3, t=3, method="lowrank", **GENTLE)
    got = np.asarray(run(unary.astype(np.float32), img.astype(np.float32)))
    err = np.abs(got - want)
    assert err.mean() < 3e-4, err.mean()
    assert err.max() < 2e-3, err.max()


def test_lowrank_crf_full_palette_beats_grid():
    """On a full-palette natural-ish image (smoothed random blobs — the case
    where 224 landmarks can NOT cover every color exactly) the lowrank path
    must still track the dense oracle better than the bilateral grid does at
    the production aff_prepare parameterization (srgb 13 < the grid's
    255/16 bin floor). Measured: lowrank 98.0% argmax agreement / 1.3e-2
    mean err vs grid 95.4% / 3.1e-2."""
    from scipy import ndimage

    h, w = 64, 80
    rng = np.random.RandomState(1)
    img = ndimage.gaussian_filter(rng.rand(h, w, 3) * 255, sigma=(6, 6, 0))
    img = ((img - img.min()) / np.ptp(img) * 255).astype(np.uint8)
    labels = (
        (ndimage.gaussian_filter(rng.rand(h, w), 8) > 0.5).astype(np.uint8)
        + (ndimage.gaussian_filter(rng.rand(h, w), 5) > 0.6).astype(np.uint8)
    )
    unary = unary_from_labels(labels, 3, gt_prob=0.7).reshape(h, w, 3)
    adv = dict(sxy_gaussian=3.0, compat_gaussian=3.0,
               sxy_bilateral=80.0, srgb=13.0, compat_bilateral=10.0)
    want = dense_meanfield_oracle(img, unary, 10, **adv)
    stats = {}
    for method in ("lowrank", "grid"):
        run = make_crf((h, w), n_labels=3, t=10, method=method, **adv)
        got = np.asarray(run(unary.astype(np.float32), img.astype(np.float32)))
        stats[method] = (
            (got.argmax(-1) == want.argmax(-1)).mean(),
            np.abs(got - want).mean(),
        )
    assert stats["lowrank"][0] > 0.97, stats
    assert stats["lowrank"][1] < 0.02, stats
    assert stats["lowrank"][0] >= stats["grid"][0], stats
    assert stats["lowrank"][1] <= stats["grid"][1], stats


def test_masked_bucket_padding_is_exact():
    """Padding to a bucket shape with valid_hw masking must reproduce the
    unpadded result on the valid region: the symmetric normalization is
    built from the valid mask, so padded pixels neither send nor receive
    messages. Grid: exact (valid pixels splat to the same cells). Lowrank:
    only the padded-size SVD truncation (tol 1e-4) differs."""
    img, noisy = _scene()
    h, w = noisy.shape
    unary = unary_from_labels(noisy, 3, gt_prob=0.7).reshape(h, w, 3).astype(np.float32)
    imgf = img.astype(np.float32)
    hp, wp = h + 24, w + 40
    unary_p = np.zeros((hp, wp, 3), np.float32)
    unary_p[:h, :w] = unary
    img_p = np.zeros((hp, wp, 3), np.float32)
    img_p[:h, :w] = imgf
    for method, tol in (("lowrank", 2e-3), ("grid", 1e-5)):
        exact = make_crf((h, w), n_labels=3, t=10, method=method, **PARAMS)
        want = np.asarray(exact(unary, imgf))
        run = make_crf(
            (hp, wp), n_labels=3, t=10, method=method, masked=True, **PARAMS
        )
        got = np.asarray(run(unary_p, img_p, (h, w)))[:h, :w]
        assert (got.argmax(-1) == want.argmax(-1)).all(), method
        err = np.abs(got - want)
        assert err.max() < tol, (method, err.max())


def test_batched_alpha_axis_matches_single_runs():
    """crf_labels_tpu_batch (one image, A labelings, shared color features)
    must match per-labeling crf_labels_tpu runs; only the m_chunk summation
    order differs."""
    from wseg_tpu.ops.crf import crf_labels_tpu, crf_labels_tpu_batch

    img, noisy = _scene()
    labels2 = ((noisy + 1) % 3).astype(np.uint8)
    batch = crf_labels_tpu_batch(img, np.stack([noisy, labels2]), t=5, n_labels=3)
    singles = np.stack(
        [crf_labels_tpu(img, lab, t=5, n_labels=3) for lab in (noisy, labels2)]
    )
    assert batch.shape == (2, 3, *noisy.shape)
    np.testing.assert_allclose(batch, singles, atol=1e-5)


def test_softmax_unary_tpu_matches_native():
    """dense_crf_tpu (stage-3 seg_test backend, softmax unary, seg
    parameterization sxy32/srgb13/1 iter) vs the native permutohedral
    dense_crf: same contract, high argmax agreement, finite marginals."""
    from wseg_tpu.ops.crf import dense_crf_tpu
    from wseg_tpu.ops.densecrf import dense_crf

    img, noisy = _scene()
    h, w = noisy.shape
    rng = np.random.RandomState(1)
    logits = np.eye(3, dtype=np.float32)[noisy] * 2.0
    logits += rng.randn(h, w, 3).astype(np.float32) * 0.3
    probs = np.ascontiguousarray(np.transpose(_softmax(logits), (2, 0, 1)))
    a = dense_crf_tpu(probs.astype(np.float32), img, n_classes=3)
    b = dense_crf(probs.astype(np.float32), img, n_classes=3)
    assert a.shape == b.shape == (3, h, w)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a.sum(0), 1.0, atol=1e-4)
    agree = (a.argmax(0) == b.argmax(0)).mean()
    assert agree > 0.97, agree
