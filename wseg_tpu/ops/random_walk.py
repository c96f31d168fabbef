"""Random-walk CAM refinement over a learned affinity matrix.

Rebuild of `aff_infer.py:105-117`: raise the dense affinity matrix to beta,
column-normalize into a transition matrix, square it logt times (T^(2^logt)),
then propagate the 8x-avg-pooled CAM through it. The repeated (hw x hw)
matmuls are pure MXU work under jit; `lax.fori_loop` keeps the squaring chain
compiled as a loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wseg_tpu.ops.resize import avg_pool2d, resize_bilinear


@partial(jax.jit, static_argnames=("beta", "logt", "compute_dtype"))
def random_walk_refine(
    cam: jax.Array, aff_mat: jax.Array, beta: int = 8, logt: int = 6,
    compute_dtype=None,
) -> jax.Array:
    """cam: (H, W, C) padded-to-/8 CAM scores (C=21, channel-last);
    aff_mat: (hw, hw) dense affinity (hw = H/8 * W/8).
    Returns the refined CAM upsampled back to (H, W, C).

    compute_dtype=jnp.bfloat16 runs the T^(2^logt) squaring chain with bf16
    operands (f32 MXU accumulation via preferred_element_type, cast back to
    bf16 between squarings); the affinity power, normalization, CAM
    propagation and upsample stay f32. The transition matrix's entries live
    in [0, 1] with unit column sums, so bf16's ~3 significant digits bound
    the relative marginal error at ~1e-2 over 6 squarings — argmax flips are
    measured, not assumed (tests/test_pcm_pairs.py, ROOFLINE.md §5d).
    """
    h, w, c = cam.shape
    dh, dw = h // 8, w // 8

    trans = aff_mat ** beta
    trans = trans / trans.sum(axis=0, keepdims=True)
    if compute_dtype is not None:
        trans = trans.astype(compute_dtype)

    def square(_, t):
        out = jnp.dot(t, t, preferred_element_type=jnp.float32)
        return out if compute_dtype is None else out.astype(compute_dtype)

    trans = jax.lax.fori_loop(0, logt, square, trans).astype(jnp.float32)

    cam_vec = avg_pool2d(cam, 8).reshape(dh * dw, c)  # (hw, C)
    # reference: cam_rw[k, j] = sum_i cam[k, i] * trans[i, j] -> trans^T @ cam
    cam_rw = jnp.dot(trans.T, cam_vec, preferred_element_type=jnp.float32)
    cam_rw = cam_rw.reshape(dh, dw, c)
    return resize_bilinear(cam_rw, (h, w), align_corners=False)
