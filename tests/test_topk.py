"""Exact sort-free top-k selection vs torch.topk / sorting."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from wseg_tpu.ops.topk import bottomk_relu_sum, topk_mean, topk_sum


def test_topk_sum_exact_random():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 1000).astype(np.float32) * 10
    for k in (1, 7, 100, 999, 1000):
        got = np.asarray(topk_sum(jnp.asarray(x), k))
        want = torch.topk(torch.from_numpy(x), k, dim=-1)[0].sum(-1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_topk_sum_with_ties():
    # heavy ties (zeros), like the ECR diff tensors
    rng = np.random.RandomState(1)
    x = rng.rand(2, 500).astype(np.float32)
    x[x < 0.8] = 0.0
    for k in (50, 200, 499):
        got = np.asarray(topk_sum(jnp.asarray(x), k))
        want = torch.topk(torch.from_numpy(x), k, dim=-1)[0].sum(-1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_topk_sum_negative_values():
    rng = np.random.RandomState(2)
    x = (rng.randn(3, 256) - 5).astype(np.float32)  # all-ish negative
    got = np.asarray(topk_sum(jnp.asarray(x), 17))
    want = torch.topk(torch.from_numpy(x), 17, dim=-1)[0].sum(-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_topk_mean_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 4000).astype(np.float32)
    k = 800
    got = float(topk_mean(jnp.asarray(x), k))
    want = float(torch.topk(torch.from_numpy(x), k, dim=-1)[0].mean())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_topk_sum_gradient():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 64).astype(np.float32)
    k = 10
    g = jax.grad(lambda x: topk_sum(x, k).sum())(jnp.asarray(x))
    g = np.asarray(g)
    # gradient mass per row = k, concentrated on the top-k entries
    np.testing.assert_allclose(g.sum(axis=1), k, rtol=1e-5)
    top_idx = np.argsort(x, axis=1)[:, -k:]
    for r in range(2):
        np.testing.assert_allclose(np.sort(np.where(g[r] > 0)[0]), np.sort(top_idx[r]))


def test_bottomk_relu_sum():
    rng = np.random.RandomState(5)
    x = rng.randn(3, 500).astype(np.float32)
    k = 125
    got = float(bottomk_relu_sum(jnp.asarray(x), k))
    y = torch.topk(torch.from_numpy(x), k, dim=-1, largest=False)[0]
    want = float(torch.relu(y).sum())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
