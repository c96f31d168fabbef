"""CRF post-processing entry points for the inference CLIs.

`crf_from_cam_dict` reproduces contrast_infer.py:102-134: assemble the
21-channel tensor from the cam dict with constant bg score, argmax to a hard
labeling, run the label-unary dense CRF (gt_prob .7, Gaussian sxy3/compat3,
bilateral sxy50/srgb5/compat10), argmax, save png.

`crf_with_alpha` reproduces aff_prepare.py:53-73: bg score
(1 - max cam)^alpha, label-unary CRF with the AdvCAM parameterization
(bilateral sxy80/srgb13), saving the (21, H, W) score array.
`crf_with_alpha_sweep` runs the whole alpha list for one image in a single
device dispatch (the alphas share the image, so the TPU CRF computes its
color features once and vmaps the mean-field over the alpha axis).

backend: 'native' = exact permutohedral C++ path (pydensecrf-faithful,
default); 'tpu' = the jitted low-rank CRF (ops/crf.py, Nystrom color x SVD
spatial — 100 ms/img on chip at 384x512, ~98% argmax agreement with the
exact dense model at the aff_prepare parameterization, and the better
approximation at contrast_infer's srgb=5).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from wseg_tpu.ops.densecrf import crf_inference_labels, crf_inference_labels_multi

AFF_CRF_PARAMS = dict(  # AdvCAM parameterization, aff_prepare.py:34-50
    sxy_gaussian=3, compat_gaussian=3,
    sxy_bilateral=80, srgb=13, compat_bilateral=10,
)


def _assemble(cam_dict: dict, bg_score: np.ndarray | float, n_labels: int = 21):
    h, w = next(iter(cam_dict.values())).shape
    tensor = np.zeros((n_labels, h, w), np.float32)
    for key, cam in cam_dict.items():
        tensor[key + 1] = cam
    tensor[0] = bg_score
    return tensor


def crf_from_cam_dict(
    cam_dict: dict, img_path: str, out_path: str, bg_score: float = 0.26,
    t: int = 10, gt_prob: float = 0.7, backend: str = "native",
) -> np.ndarray:
    import imageio

    tensor = _assemble(cam_dict, bg_score)
    predict = np.argmax(tensor, axis=0).astype(np.uint8)
    img = np.array(Image.open(img_path).convert("RGB"))
    params = dict(
        sxy_gaussian=3, compat_gaussian=3,
        sxy_bilateral=50, srgb=5, compat_bilateral=10,
    )
    if backend == "tpu":
        from wseg_tpu.ops.crf import crf_labels_tpu

        crf_score = crf_labels_tpu(img, predict, t=t, gt_prob=gt_prob, **params)
    else:
        crf_score = crf_inference_labels(img, predict, t=t, gt_prob=gt_prob, **params)
    pred = np.argmax(crf_score, axis=0).astype(np.uint8)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    imageio.imsave(out_path, pred)
    return pred


def _alpha_seed(cam_dict: dict, alpha: float) -> np.ndarray:
    """The per-alpha argmax seed labeling (aff_prepare.py:62-66)."""
    h, w = next(iter(cam_dict.values())).shape
    tensor = np.zeros((21, h, w), np.float32)
    for key, cam in cam_dict.items():
        tensor[key + 1] = cam
    tensor[0] = np.power(1 - np.max(tensor, axis=0, keepdims=False), alpha)
    return np.argmax(tensor, axis=0).astype(np.uint8)


def crf_with_alpha(
    cam_dict: dict, img_path: str, alpha: float, t: int = 10, gt_prob: float = 0.7,
    backend: str = "native",
) -> np.ndarray:
    """(21, H, W) CRF score array for one image at the given bg alpha."""
    predict = _alpha_seed(cam_dict, alpha)
    img = np.array(Image.open(img_path).convert("RGB"))
    if backend == "tpu":
        from wseg_tpu.ops.crf import crf_labels_tpu

        return crf_labels_tpu(img, predict, t=t, gt_prob=gt_prob, **AFF_CRF_PARAMS)
    return crf_inference_labels(img, predict, t=t, gt_prob=gt_prob, **AFF_CRF_PARAMS)


def crf_with_alpha_sweep(
    cam_dict: dict, img_path: str, alphas, t: int = 10, gt_prob: float = 0.7,
    backend: str = "native",
) -> list[np.ndarray]:
    """All alphas for one image: list of (21, H, W) CRF score arrays.

    On the tpu backend this is ONE device dispatch: the alpha seeds are
    stacked on a leading axis and the CRF shares the image's Nystrom color
    features / kernel factors across the sweep (ops/crf.py batch=True). On
    the native backend the alphas share the image's permutohedral lattice
    builds (one init per image instead of five — the lattices depend only
    on the image), bit-identical to per-alpha calls."""
    seeds = np.stack([_alpha_seed(cam_dict, a) for a in alphas])
    img = np.array(Image.open(img_path).convert("RGB"))
    if backend != "tpu":
        out = crf_inference_labels_multi(
            img, seeds, t=t, gt_prob=gt_prob, **AFF_CRF_PARAMS
        )
        return list(out)
    from wseg_tpu.ops.crf import crf_labels_tpu_batch

    out = crf_labels_tpu_batch(img, seeds, t=t, gt_prob=gt_prob, **AFF_CRF_PARAMS)
    return list(out)
