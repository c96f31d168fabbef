"""JAX CRF (default lowrank path) vs the native permutohedral CRF (loose
agreement: both approximate the same model) + behavior checks."""

import numpy as np

from wseg_tpu.ops.crf import crf_labels_tpu
from wseg_tpu.ops.densecrf import crf_inference_labels


def _synthetic():
    h, w = 48, 64
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = 40
    img[:, w // 2 :] = 210
    labels = np.zeros((h, w), np.uint8)
    labels[:, w // 2 :] = 1
    rng = np.random.RandomState(0)
    noisy = labels.copy()
    flip = rng.rand(h, w) < 0.15
    noisy[flip] = 1 - noisy[flip]
    return img, labels, noisy


def test_tpu_crf_denoises():
    img, labels_true, noisy = _synthetic()
    q = crf_labels_tpu(img, noisy, t=10, n_labels=2)
    pred = np.argmax(q, axis=0)
    err_before = (noisy != labels_true).mean()
    err_after = (pred != labels_true).mean()
    assert err_after < err_before * 0.3, (err_before, err_after)


def test_tpu_crf_agrees_with_native():
    img, _, noisy = _synthetic()
    q_tpu = crf_labels_tpu(img, noisy, t=5, n_labels=2)
    q_cpp = crf_inference_labels(img, noisy, t=5, n_labels=2)
    agree = (np.argmax(q_tpu, 0) == np.argmax(q_cpp, 0)).mean()
    assert agree > 0.97, agree
