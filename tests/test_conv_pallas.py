"""Pallas implicit-GEMM dilated conv vs jax.lax.conv (interpret mode).

The kernel is a documented perf exploration (ROOFLINE.md §7 — measured
slower than XLA's conv emitter on the chip, so the models don't use it),
but its exactness contract is kept tested so the measurement stays
reproducible. Semantics under test: stride-1 SAME 3x3 with
padding == dilation, the trunk's only 3x3 configuration
(network/resnet38d.py:17-22)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wseg_tpu.kernels.conv_pallas import conv3x3_dilated


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_conv3x3_dilated_matches_xla(dilation):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_dilated(x, k, dilation=dilation, tile_co=16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_dilated_co_tiling():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 4, 32), jnp.float32)
    ref = conv3x3_dilated(x, k, dilation=2, tile_co=32, interpret=True)
    got = conv3x3_dilated(x, k, dilation=2, tile_co=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
