"""Fused Pallas PCM kernel (inference path).

PCM (network/resnet38_contrast.py:63-75) propagates a CAM through the pixel
affinity `aff = relu(fn fn^T)` column-normalized, where fn is the
channel-L2-normalized f9 feature map. Materializing `aff` costs hw^2 floats
of HBM: at CAM-inference scale 2 on a 384x512 image hw = 96*128 = 12288, i.e.
a 604 MB intermediate written and read back per flip-pair. This kernel never
materializes it: affinity tiles are (re)computed in VMEM on the MXU in two
passes —

  single pass: each affinity tile A = relu(Fi Fj^T) is computed ONCE on the
  MXU and consumed for BOTH reductions before being discarded:
      s_j   += colsum(A)            (column sums for the normalization)
      out_j += A^T cam_i            (unnormalized propagation)

and the caller divides by (s_j + eps). Fewer FLOPs than recomputing A per
pass and ~hw^2/TILE fewer HBM bytes than the naive three-matmul form — and
PCM is bandwidth-bound on TPU.

Forward-only (inference); training uses the XLA formulation in ops/pcm.py
(hw = 56^2 there, where the intermediate is a harmless 39 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # rows per block (sublane multiple of 8 for f32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pcm_tile_kernel(fj_ref, fi_ref, cam_ref, colsum_ref, acc_ref):
    i = pl.program_id(2)
    aff = jax.nn.relu(
        jnp.dot(fi_ref[:], fj_ref[:].T, preferred_element_type=jnp.float32)
    )  # (TILE_I, TILE_J), lives only in VMEM

    @pl.when(i == 0)
    def _():
        colsum_ref[:] = jnp.zeros_like(colsum_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    colsum_ref[:] += aff.sum(axis=0, keepdims=True)  # (1, TILE_J)
    acc_ref[:] += jnp.dot(aff.T, cam_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def pcm_fused(cam: jax.Array, f: jax.Array, eps: float = 1e-5,
              interpret: bool = False) -> jax.Array:
    """cam: (N, HW, C) CAM already at f's resolution; f: (N, HW, Cf) RAW f9
    output (normalization happens inside). Returns (N, HW, C).
    Matches ops.pcm.pcm's math exactly (same eps placement)."""
    n, hw, c = cam.shape
    cf = f.shape[-1]

    fn = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + eps)

    hw_p = _round_up(hw, TILE)
    cf_p = _round_up(cf, 128)
    c_p = _round_up(c, 128)
    fn = jnp.pad(fn, ((0, 0), (0, hw_p - hw), (0, cf_p - cf)))
    cam_p = jnp.pad(cam, ((0, 0), (0, hw_p - hw), (0, c_p - c))).astype(jnp.float32)

    nj = hw_p // TILE
    grid = (n, nj, hw_p // TILE)  # (batch, j block, i block)

    fj_spec = pl.BlockSpec((1, TILE, cf_p), lambda b, j, i: (b, j, 0),
                           memory_space=pltpu.VMEM)
    fi_spec = pl.BlockSpec((1, TILE, cf_p), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec((1, TILE, c_p), lambda b, j, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def tile_kernel(fj_ref, fi_ref, cam_ref, colsum_ref, acc_ref):
        _pcm_tile_kernel(
            fj_ref.at[0], fi_ref.at[0], cam_ref.at[0],
            colsum_ref.at[0], acc_ref.at[0],
        )

    colsum, acc = pl.pallas_call(
        tile_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, hw_p), jnp.float32),
            jax.ShapeDtypeStruct((n, hw_p, c_p), jnp.float32),
        ),
        grid=grid,
        in_specs=[fj_spec, fi_spec, cam_spec],
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda b, j, i: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, c_p), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(fn, fn, cam_p)

    out = acc / (colsum.reshape(n, hw_p, 1) + eps)
    return out[:, :hw, :c].astype(cam.dtype)


def pcm_fused_nhwc(cam: jax.Array, f: jax.Array, eps: float = 1e-5,
                   interpret: bool = False) -> jax.Array:
    """NHWC wrapper matching ops.pcm.pcm's interface: cam (N, Hc, Wc, C) is
    first resized to f's (N, H, W, Cf) spatial dims (align_corners=True)."""
    from wseg_tpu.ops.resize import resize_bilinear

    n, h, w, cf = f.shape
    cam = resize_bilinear(cam, (h, w), align_corners=True)
    c = cam.shape[-1]
    out = pcm_fused(
        cam.reshape(n, h * w, c), f.reshape(n, h * w, cf), eps=eps,
        interpret=interpret,
    )
    return out.reshape(n, h, w, c)
