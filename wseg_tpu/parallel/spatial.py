"""Spatially-sharded PCM over a `space` mesh axis (shard_map + psum).

SURVEY.md §5.7: the reference's quadratic-cost component is the dense
hw x hw PCM/affinity matmul; it never shards a single image. Here the pixel
dimension is sharded across chips: each device holds a row-block of the
normalized features and CAM, computes its partial affinity against the
all-gathered column block, and the column-sum + propagation reduce with
`psum` over ICI. Memory per chip drops from O(hw^2) to O(hw^2 / n_space)
and compute parallelizes — image resolution can outgrow one chip.

Numerically identical to ops.pcm.pcm (same eps placement); tested on the
virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 stable location
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pcm_spatial(cam: jax.Array, f: jax.Array, mesh: Mesh,
                axis: str = "space", eps: float = 1e-5) -> jax.Array:
    """cam: (N, HW, C), f: (N, HW, Cf) raw f9 features; HW must divide the
    `axis` size. Returns (N, HW, C) with HW sharded over `axis`."""
    n, hw, c = cam.shape
    nshards = mesh.shape[axis]
    assert hw % nshards == 0, (hw, nshards)

    fn = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + eps)

    def block(fn_blk, fn_all, cam_blk):
        # fn_blk: (N, HW/s, Cf) local rows; fn_all: (N, HW, Cf) replicated
        # via all_gather below; cam_blk: (N, HW/s, C) local rows.
        # local affinity rows: aff[i_local, j] for all j
        aff = jax.nn.relu(jnp.einsum("nic,njc->nij", fn_blk, fn_all))
        colsum = jax.lax.psum(aff.sum(axis=1), axis)  # (N, HW)
        # propagate: out[j] = sum_i aff[i, j] cam[i] -> partial over local i
        out = jax.lax.psum(jnp.einsum("nij,nic->njc", aff, cam_blk), axis)
        out = out / (colsum[..., None] + eps)
        # return the local row block of the result
        idx = jax.lax.axis_index(axis)
        blk = hw // nshards
        return jax.lax.dynamic_slice_in_dim(out, idx * blk, blk, axis=1)

    def gathered(fn_sh, cam_sh):
        fn_all = jax.lax.all_gather(fn_sh, axis, axis=1, tiled=True)
        return block(fn_sh, fn_all, cam_sh)

    spec_rows = P(None, axis, None)
    fn_sh = jax.lax.with_sharding_constraint(fn, NamedSharding(mesh, spec_rows))
    cam_sh = jax.lax.with_sharding_constraint(cam, NamedSharding(mesh, spec_rows))
    out = shard_map(
        gathered, mesh=mesh,
        in_specs=(spec_rows, spec_rows),
        out_specs=spec_rows,
    )(fn_sh, cam_sh)
    return out
