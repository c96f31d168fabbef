"""Pallas implicit-GEMM convolution for the stride-8 trunk's dilated 3x3s.

Motivation (measured on the round-3 chip, ROOFLINE.md §7): XLA's conv on the
dominant b6/b7 shape (3x3 dilation-d, 1024->2048 at 48x64 spatial) sustains
~143-153 TFLOP/s bf16 while a same-FLOPs plain matmul sustains ~166 — a
scheduling gap worth probing. This kernel computes the conv as 9 shifted
matmuls with a single f32 accumulator and never writes the im2col matrix or
per-tap partials to HBM.

OUTCOME (scripts/conv_probe.py on the chip, ROOFLINE.md §7): best tiling
reaches 135.8 TFLOP/s vs XLA's 153.5 on the same shape — a NEGATIVE result.
At VMEM-expressible tile sizes (row tile = dilation to keep every BlockSpec
offset block-aligned) each grid step streams a fresh 4.7 MB weight co-tile
for 1.2 GFLOP (~258 FLOP/byte), so the kernel sits at the HBM edge where
XLA's conv emitter, free to tile H x W x CO jointly, stays compute-bound.
Kept as a documented exploration with an exactness test; the models use XLA
convs, by measurement.

Mosaic constraint shaping the design: block slices on the tiled (minor two)
dims must be tile-aligned, so no in-kernel halo slicing. Instead the W-shift
is materialized as 3 XLA-level shifted views (cheap: this conv is
compute-bound ~25:1), and the H-shift rides the BlockSpec index maps — the
row-tile height equals the dilation, making every dy offset a whole number
of blocks. 9 input specs (3 arrays x 3 row maps), all static.

Layout: NHWC x (3, 3, CI, CO) -> NHWC, stride 1, SAME padding = dilation
(the trunk's only 3x3 configuration, network/resnet38d.py:17-22 semantics).
Forward-only — intended for the inference path; training keeps XLA convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, th, tw, ci):
    # refs: 9 input tiles (1, th, tw, ci) in dy-major tap order, k_ref
    # (3, 3, ci, co_t), o_ref (1, th, tw, co_t).
    k_ref, o_ref = refs[9], refs[10]
    acc = jnp.zeros((th * tw, o_ref.shape[-1]), jnp.float32)
    for t in range(9):
        a = refs[t][0].reshape(th * tw, ci)
        acc += jnp.dot(a, k_ref[t // 3, t % 3],
                       preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(th, tw, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "tile_co", "interpret")
)
def conv3x3_dilated(
    x: jax.Array, k: jax.Array, dilation: int = 4,
    tile_co: int = 256, interpret: bool = False,
) -> jax.Array:
    """x: (B, H, W, CI); k: (3, 3, CI, CO). Stride-1 SAME conv with
    `dilation` (padding == dilation, the trunk's configuration). Returns
    (B, H, W, CO) in x.dtype with f32 accumulation. Row-tile height is
    `dilation` (so H must be a multiple of it)."""
    b, h, w, ci = x.shape
    co = k.shape[-1]
    d = th = dilation
    assert k.shape[:2] == (3, 3) and k.shape[2] == ci
    assert h % th == 0, (h, th)
    assert co % tile_co == 0, (co, tile_co)

    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    # 3 W-shifted views, each (B, H + 2d, W, CI); dy becomes a whole-block
    # row offset below.
    xs = [xp[:, :, dx * d : dx * d + w, :] for dx in range(3)]

    grid = (b, h // th, co // tile_co)

    def row_map(dy):
        return lambda bi, hi, ci_: (bi, hi + dy, 0, 0)

    in_specs = []
    for dy in range(3):
        for dx in range(3):
            in_specs.append(pl.BlockSpec(
                (1, th, w, ci), row_map(dy), memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(
        (3, 3, ci, tile_co), lambda bi, hi, ci_: (0, 0, 0, ci_),
        memory_space=pltpu.VMEM))

    kern = functools.partial(_kernel, th=th, tw=w, ci=ci)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, w, tile_co), lambda bi, hi, ci_: (bi, hi, 0, ci_),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(*[xs[dx] for dy in range(3) for dx in range(3)], k)
