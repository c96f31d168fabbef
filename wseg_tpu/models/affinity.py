"""AffinityNet: pixel-pair affinity head over the ResNet-38 backbone.

Rebuild of `network/resnet38_aff.py`: ELU taps f8_3 (512->64), f8_4
(1024->128), f8_5 (4096->256) concatenated -> f9 448->448 ELU (:14-18,39-42);
pairwise affinity `exp(-mean|ft - ff|)` over the radius-5 half-disc pair
index lists (:57-63); optional symmetric dense affinity matrix (:65-78).

The pair indices are compile-time constants per feature-map size, so the
gathers become static `jnp.take`s inside the jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import conv, xavier_uniform
from wseg_tpu.models.resnet38 import ResNet38
from wseg_tpu.ops.pairs import (
    dense_affinity_matrix,
    pairwise_affinity,
    pairwise_affinity_sliced,
    radius_pair_indices,
)
from wseg_tpu.utils.registry import MODELS


@MODELS.register("affinity")
class AffinityNet(nn.Module):
    radius: int = 5
    # "sliced" computes the pair affinities from static shifted slices (no
    # (N, D, P, C) gather temp in HBM — identical output, ROOFLINE.md §5d);
    # "gather" keeps the jnp.take formulation of network/resnet38_aff.py:57-63.
    pair_impl: str = "sliced"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, to_dense: bool = False):
        d = ResNet38(name="backbone")(x, train=train)

        f8_3 = jax.nn.elu(conv(64, 1, name="f8_3")(d["conv4"]))
        f8_4 = jax.nn.elu(conv(128, 1, name="f8_4")(d["conv5"]))
        f8_5 = jax.nn.elu(conv(256, 1, name="f8_5")(d["conv6"]))
        f = jnp.concatenate([f8_3, f8_4, f8_5], axis=-1)  # 448
        f = jax.nn.elu(conv(448, 1, kernel_init=xavier_uniform(gain=4.0), name="f9")(f))

        n, h, w, c = f.shape
        min_edge = min(h, w)
        radius = (min_edge - 1) // 2 if min_edge < self.radius * 2 + 1 else self.radius

        if self.pair_impl == "sliced":
            aff = pairwise_affinity_sliced(f, radius)  # (N, D, P)
        else:
            ind_from_np, ind_to_np = radius_pair_indices(radius, (h, w))
            aff = pairwise_affinity(
                f.reshape(n, h * w, c),
                jnp.asarray(ind_from_np),
                jnp.asarray(ind_to_np),
            )

        if to_dense:
            assert n == 1, "dense affinity matrix is per-image"
            ind_from_np, ind_to_np = radius_pair_indices(radius, (h, w))
            return dense_affinity_matrix(
                aff[0], jnp.asarray(ind_from_np), jnp.asarray(ind_to_np), h * w
            )
        return aff
