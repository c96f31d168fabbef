"""Pixel Correlation Module (PCM) — the SEAM self-attention CAM refinement.

Reference math: `network/resnet38_contrast.py:63-75` / `resnet38_SEAM.py:55-67`:
given a feature map f (already passed through the 1x1 `f9` conv) and a CAM,
L2-normalize f over channels, build the pixel-pair affinity
`aff = relu(f^T f)`, column-normalize it, and propagate the CAM through it.

The (hw x hw) affinity matmul is the hot op of the train step (hw = 56^2 at
crop 448). Formulated as two batched matmuls it maps directly onto the MXU;
a fused Pallas kernel (kernels/pcm_pallas.py) is used on TPU for larger hw.

NHWC layout: cam (N, H, W, C_cam), f (N, H, W, C_f).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wseg_tpu.ops.resize import resize_bilinear


def pcm(cam: jax.Array, f: jax.Array, eps: float = 1e-5, mask=None) -> jax.Array:
    """Propagate `cam` through the pixel-affinity of `f`.

    cam: (N, Hc, Wc, C) — resized to f's spatial dims (align_corners=True)
    f:   (N, H, W, Cf) — output of the f9 1x1 conv
    mask: optional (N, H, W, 1) valid-region mask (bucketed inference): pad
    pixels are removed from the affinity (rows AND columns), so valid outputs
    equal the exact-shape PCM — without it the column normalization mixes pad
    features into every valid pixel.
    returns (N, H, W, C)
    """
    n, h, w, cf = f.shape
    cam = resize_bilinear(cam, (h, w), align_corners=True)
    c = cam.shape[-1]

    fv = f.reshape(n, h * w, cf)
    fv = fv / (jnp.linalg.norm(fv, axis=-1, keepdims=True) + eps)
    if mask is not None:
        fv = fv * mask.reshape(n, h * w, 1)
    # aff[i, j] = relu(<f_i, f_j>); column-normalized over i (dim=1 in the
    # reference's (n, hw, hw) layout)
    aff = jax.nn.relu(jnp.einsum("nic,njc->nij", fv, fv))
    aff = aff / (aff.sum(axis=1, keepdims=True) + eps)
    cam_rv = jnp.einsum("nij,nic->njc", aff, cam.reshape(n, h * w, c))
    return cam_rv.reshape(n, h, w, c)
