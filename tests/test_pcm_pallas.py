"""Fused Pallas PCM kernel vs the XLA reference implementation (interpret
mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.kernels.pcm_pallas import pcm_fused, pcm_fused_nhwc
from wseg_tpu.ops.pcm import pcm


def test_pcm_fused_matches_xla():
    rng = np.random.RandomState(0)
    n, h, w, cf, c = 2, 24, 24, 192, 21
    f = jnp.asarray(rng.randn(n, h, w, cf), jnp.float32)
    cam = jnp.asarray(rng.rand(n, h, w, c), jnp.float32)
    want = np.asarray(pcm(cam, f))
    got = np.asarray(pcm_fused_nhwc(cam, f, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_pcm_fused_nonmultiple_hw():
    rng = np.random.RandomState(1)
    n, hw, cf, c = 1, 700, 64, 21  # hw not a multiple of TILE
    f = jnp.asarray(rng.randn(n, hw, cf), jnp.float32)
    cam = jnp.asarray(rng.rand(n, hw, c), jnp.float32)
    fn = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-5)
    aff = jax.nn.relu(jnp.einsum("nic,njc->nij", fn, fn))
    aff = aff / (aff.sum(axis=1, keepdims=True) + 1e-5)
    want = np.asarray(jnp.einsum("nij,nic->njc", aff, cam))
    got = np.asarray(pcm_fused(cam, f, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
