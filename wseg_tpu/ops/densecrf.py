"""Dense CRF post-processing (ctypes binding of the native permutohedral
mean-field implementation in native/densecrf/).

Replaces `pydensecrf` (requirements.txt:3) with first-party native code:
the same fully-connected Gaussian+bilateral Potts CRF and the same call
sites' parameterizations:

* `crf_inference_labels` — label unary with gt_prob (pydensecrf
  `unary_from_labels`; contrast_infer.py:115-126 / aff_prepare.py:34-50)
* `crf_inference_softmax` — softmax unary (tool/imutils.py:220-237,
  segmentation/lib/utils/DenseCRF.py:5-39)

The shared library is built on first use with g++ (no pip deps); the ctypes
call releases the GIL so images can be CRF'd from a thread pool like the
reference's 8-process fan-out.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "densecrf",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwseg_densecrf.so")
_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < max(
            os.path.getmtime(os.path.join(_NATIVE_DIR, f))
            for f in ("densecrf.cc", "permutohedral.h")
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wseg_densecrf_inference.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wseg_densecrf_inference_multi.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wseg_permutohedral_filter.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def permutohedral_filter(features: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Gaussian filter `values` (n, v) over `features` (n, d) — test hook."""
    lib = _load_lib()
    features = np.ascontiguousarray(features, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    n, d = features.shape
    v = values.shape[1]
    out = np.empty_like(values)
    lib.wseg_permutohedral_filter(_fp(features), d, n, _fp(values), v, _fp(out))
    return out


def _inference(
    unary_nl: np.ndarray, rgb: np.ndarray | None, t: int,
    gaussian_sxy: float, gaussian_compat: float,
    bilateral_sxy: float, bilateral_srgb: float, bilateral_compat: float,
    h: int, w: int, n_labels: int,
) -> np.ndarray:
    lib = _load_lib()
    out = np.empty_like(unary_nl)
    rgb_ptr = (
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)) if rgb is not None else None
    )
    lib.wseg_densecrf_inference(
        h, w, n_labels, _fp(unary_nl), rgb_ptr, t,
        ctypes.c_float(gaussian_sxy), ctypes.c_float(gaussian_compat),
        ctypes.c_float(bilateral_sxy), ctypes.c_float(bilateral_srgb),
        ctypes.c_float(bilateral_compat),
        _fp(out),
    )
    return out


def _inference_multi(
    unary_anl: np.ndarray, rgb: np.ndarray | None, t: int,
    gaussian_sxy: float, gaussian_compat: float,
    bilateral_sxy: float, bilateral_srgb: float, bilateral_compat: float,
    h: int, w: int, n_labels: int,
) -> np.ndarray:
    """A independent unary fields sharing one image (and so one lattice
    build): unary_anl is (A, H*W, L) energies, returns (A, H*W, L)
    marginals. Bit-identical to A sequential `_inference` calls."""
    lib = _load_lib()
    unary_anl = np.ascontiguousarray(unary_anl, np.float32)
    out = np.empty_like(unary_anl)
    rgb_ptr = (
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)) if rgb is not None else None
    )
    lib.wseg_densecrf_inference_multi(
        h, w, n_labels, unary_anl.shape[0], _fp(unary_anl), rgb_ptr, t,
        ctypes.c_float(gaussian_sxy), ctypes.c_float(gaussian_compat),
        ctypes.c_float(bilateral_sxy), ctypes.c_float(bilateral_srgb),
        ctypes.c_float(bilateral_compat),
        _fp(out),
    )
    return out


def unary_from_labels(labels: np.ndarray, n_labels: int, gt_prob: float) -> np.ndarray:
    """(H*W, L) energy = -log P from a hard labeling (pydensecrf
    `unary_from_labels` with zero_unsure=False)."""
    h, w = labels.shape
    p_energy = -np.log(gt_prob)
    n_energy = -np.log((1.0 - gt_prob) / (n_labels - 1))
    u = np.full((h * w, n_labels), n_energy, np.float32)
    u[np.arange(h * w), labels.reshape(-1).astype(np.int64)] = p_energy
    return u


def unary_from_softmax(probs: np.ndarray) -> np.ndarray:
    """probs: (L, H, W) -> (H*W, L) energy = -log p."""
    l, h, w = probs.shape
    return np.ascontiguousarray(
        -np.log(np.clip(probs, 1e-20, None)).reshape(l, h * w).T
    )


def crf_inference_labels(
    img: np.ndarray, labels: np.ndarray, t: int = 10, n_labels: int = 21,
    gt_prob: float = 0.7, sxy_gaussian: float = 3, compat_gaussian: float = 3,
    sxy_bilateral: float = 50, srgb: float = 5, compat_bilateral: float = 10,
) -> np.ndarray:
    """Label-unary CRF (contrast_infer.py:115-126 parameterization; pass
    sxy_bilateral=80, srgb=13 for the aff_prepare.py:34-50 variant).
    Returns (L, H, W) marginals."""
    h, w = labels.shape
    img = np.ascontiguousarray(img, np.uint8)
    unary = unary_from_labels(labels, n_labels, gt_prob)
    q = _inference(
        unary, img, t, sxy_gaussian, compat_gaussian,
        sxy_bilateral, srgb, compat_bilateral, h, w, n_labels,
    )
    return np.ascontiguousarray(q.T.reshape(n_labels, h, w))


def crf_inference_labels_multi(
    img: np.ndarray, labels_stack: np.ndarray, t: int = 10, n_labels: int = 21,
    gt_prob: float = 0.7, sxy_gaussian: float = 3, compat_gaussian: float = 3,
    sxy_bilateral: float = 50, srgb: float = 5, compat_bilateral: float = 10,
) -> np.ndarray:
    """Label-unary CRF for A labelings of ONE image, sharing the lattice
    builds (aff_prepare's alpha sweep: same image, per-alpha seeds).
    labels_stack: (A, H, W); returns (A, L, H, W) marginals — bit-identical
    to A `crf_inference_labels` calls."""
    a, h, w = labels_stack.shape
    img = np.ascontiguousarray(img, np.uint8)
    unary = np.stack(
        [unary_from_labels(labels_stack[i], n_labels, gt_prob) for i in range(a)]
    )
    q = _inference_multi(
        unary, img, t, sxy_gaussian, compat_gaussian,
        sxy_bilateral, srgb, compat_bilateral, h, w, n_labels,
    )
    return np.ascontiguousarray(q.transpose(0, 2, 1).reshape(a, n_labels, h, w))


def dense_crf(
    probs: np.ndarray, img: np.ndarray, n_classes: int = 21, n_iters: int = 1,
    scale_factor: float = 1,
) -> np.ndarray:
    """Stage-3 test-time CRF (segmentation/lib/utils/DenseCRF.py:5-39):
    softmax unary, Gaussian sxy3/compat3, bilateral **sxy32**/srgb13/compat10
    (the reference's seg variant uses 32, not imutils' 80), ONE mean-field
    iteration by default. probs: (C, H, W); img: (H, W, 3) uint8."""
    return crf_inference_softmax(
        img, probs, t=n_iters, scale_factor=scale_factor, labels=n_classes,
        sxy_bilateral=32,
    )


def crf_inference_softmax(
    img: np.ndarray, probs: np.ndarray, t: int = 10, scale_factor: float = 1,
    labels: int = 21, sxy_gaussian: float = 3, compat_gaussian: float = 3,
    sxy_bilateral: float = 80, srgb: float = 13, compat_bilateral: float = 10,
) -> np.ndarray:
    """Softmax-unary CRF (tool/imutils.py:220-237: sxy 80/scale, srgb 13)."""
    h, w = img.shape[:2]
    img = np.ascontiguousarray(img, np.uint8)
    unary = unary_from_softmax(probs)
    q = _inference(
        unary, img, t, sxy_gaussian / scale_factor, compat_gaussian,
        sxy_bilateral / scale_factor, srgb, compat_bilateral, h, w, labels,
    )
    return np.ascontiguousarray(q.T.reshape(labels, h, w))
