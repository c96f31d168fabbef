"""Spatially-sharded PCM equals the single-device op on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.ops.pcm import pcm
from wseg_tpu.parallel.mesh import make_mesh
from wseg_tpu.parallel.spatial import pcm_spatial


def test_pcm_spatial_matches_single_device():
    mesh = make_mesh(jax.devices()[:8], axis_name="space")
    rng = np.random.RandomState(0)
    n, h, w, cf, c = 1, 16, 16, 48, 21  # hw = 256, divisible by 8
    f = jnp.asarray(rng.randn(n, h, w, cf), jnp.float32)
    cam = jnp.asarray(rng.rand(n, h, w, c), jnp.float32)

    want = np.asarray(pcm(cam, f))  # (N, H, W, C)

    got = jax.jit(
        lambda cam, f: pcm_spatial(cam, f, mesh, axis="space")
    )(cam.reshape(n, h * w, c), f.reshape(n, h * w, cf))
    got = np.asarray(got).reshape(n, h, w, c)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
