"""Native dense-CRF tests: lattice filtering properties + mean-field behavior."""

import numpy as np
import pytest

from wseg_tpu.ops.densecrf import (
    crf_inference_labels,
    crf_inference_softmax,
    permutohedral_filter,
    unary_from_labels,
)


def gauss_reference(features, values):
    """Brute-force Gaussian filter: out_i = sum_j exp(-|fi-fj|^2/2) v_j."""
    d2 = ((features[:, None, :] - features[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2)
    return k @ values


def test_permutohedral_close_to_bruteforce():
    rng = np.random.RandomState(0)
    n, d = 300, 2
    features = rng.rand(n, d).astype(np.float32) * 4
    values = rng.rand(n, 3).astype(np.float32)
    got = permutohedral_filter(features, values)
    want = gauss_reference(features, values)
    # the lattice is an approximation; compare after per-point normalization
    got_n = got / permutohedral_filter(features, np.ones((n, 1), np.float32))
    want_n = want / gauss_reference(features, np.ones((n, 1), np.float32))
    err = np.abs(got_n - want_n).mean() / (np.abs(want_n).mean() + 1e-9)
    assert err < 0.08, err


def test_permutohedral_5d():
    rng = np.random.RandomState(1)
    n, d = 200, 5
    features = rng.rand(n, d).astype(np.float32) * 3
    values = rng.rand(n, 2).astype(np.float32)
    got = permutohedral_filter(features, values)
    want = gauss_reference(features, values)
    got_n = got / permutohedral_filter(features, np.ones((n, 1), np.float32))
    want_n = want / gauss_reference(features, np.ones((n, 1), np.float32))
    err = np.abs(got_n - want_n).mean() / (np.abs(want_n).mean() + 1e-9)
    assert err < 0.12, err


def test_unary_from_labels():
    labels = np.array([[0, 1], [2, 0]], np.uint8)
    u = unary_from_labels(labels, 3, 0.7)
    assert u.shape == (4, 3)
    np.testing.assert_allclose(u[0, 0], -np.log(0.7), rtol=1e-6)
    np.testing.assert_allclose(u[0, 1], -np.log(0.15), rtol=1e-6)


def _synthetic_image():
    """Two-region image: left dark, right bright, with a noisy label seed."""
    h, w = 48, 64
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = 40
    img[:, w // 2 :] = 210
    labels = np.zeros((h, w), np.uint8)
    labels[:, w // 2 :] = 1
    # inject label noise
    rng = np.random.RandomState(0)
    noise = rng.rand(h, w) < 0.15
    labels_noisy = labels.copy()
    labels_noisy[noise] = 1 - labels_noisy[noise]
    return img, labels, labels_noisy


def test_crf_denoises_labels():
    """Mean-field with bilateral edges should clean label noise aligned with
    the color edge — the core behavior stage-2 label generation relies on."""
    img, labels_true, labels_noisy = _synthetic_image()
    q = crf_inference_labels(img, labels_noisy, t=10, n_labels=2)
    pred = np.argmax(q, axis=0)
    err_before = (labels_noisy != labels_true).mean()
    err_after = (pred != labels_true).mean()
    assert err_after < err_before * 0.2, (err_before, err_after)


def test_crf_softmax_unary():
    img, labels_true, _ = _synthetic_image()
    h, w = labels_true.shape
    probs = np.full((2, h, w), 0.5, np.float32)
    probs[0] += np.random.RandomState(1).randn(h, w).astype(np.float32) * 0.05
    probs[1] = 1 - probs[0]
    q = crf_inference_softmax(img, probs, t=5, labels=2)
    assert q.shape == (2, h, w)
    np.testing.assert_allclose(q.sum(axis=0), 1.0, atol=1e-4)


def test_dense_crf_uses_reference_seg_parameterization(monkeypatch):
    """cli/seg_test's CRF must use the SEG variant of the parameters:
    bilateral sxy=32 (NOT imutils' 80), srgb 13, compat 10, Gaussian 3/3,
    ONE iteration by default — segmentation/lib/utils/DenseCRF.py:20-23."""
    import wseg_tpu.ops.densecrf as dc

    captured = {}

    def fake_inference(unary, rgb, t, gs, gc, bs, bsr, bc, h, w, n_labels):
        captured.update(t=t, gs=gs, gc=gc, bs=bs, bsr=bsr, bc=bc,
                        n_labels=n_labels)
        return np.full_like(unary, 1.0 / n_labels)

    monkeypatch.setattr(dc, "_inference", fake_inference)
    probs = np.full((21, 8, 8), 1 / 21, np.float32)
    img = np.zeros((8, 8, 3), np.uint8)
    out = dc.dense_crf(probs, img)
    assert out.shape == (21, 8, 8)
    assert captured == dict(t=1, gs=3, gc=3, bs=32, bsr=13, bc=10,
                            n_labels=21)


def test_multi_unary_matches_singles_bitwise():
    """crf_inference_labels_multi shares one lattice build across A labelings
    of the same image (aff_prepare's alpha sweep); outputs must be
    bit-identical to A independent single calls."""
    from wseg_tpu.ops.densecrf import crf_inference_labels_multi

    rng = np.random.RandomState(3)
    img = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
    base = rng.randint(0, 5, (40, 56)).astype(np.uint8)
    seeds = np.stack([np.roll(base, i, axis=1) for i in range(3)])
    multi = crf_inference_labels_multi(
        img, seeds, t=4, n_labels=5, sxy_bilateral=80, srgb=13
    )
    singles = np.stack([
        crf_inference_labels(img, s, t=4, n_labels=5, sxy_bilateral=80, srgb=13)
        for s in seeds
    ])
    assert multi.shape == (3, 5, 40, 56)
    np.testing.assert_array_equal(multi, singles)
