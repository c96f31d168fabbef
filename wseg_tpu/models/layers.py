"""Shared Flax building blocks (NHWC, TPU-first).

BatchNorm notes: the reference freezes every BN in the stage-1 backbones
(`network/resnet38d.py:207-212` forces eval mode + no grads), so stage-1 BN
is a constant per-channel affine from the running stats. Stage-3 (DeepLab)
trains BN with a custom thread-queue SyncBN (`segmentation/lib/net/
sync_batchnorm/`); here batch stats are computed with plain `jnp.mean` over
the global batch — under jit/GSPMD with a batch-sharded input XLA inserts the
cross-chip all-reduce automatically, which *is* sync-BN on a TPU mesh.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm2d(nn.Module):
    """BatchNorm over NHWC with torch-compatible parameterization.

    frozen=True: normalize with the stored running stats only (never
    updated); gamma/beta still live in 'params' so checkpoints load, and the
    optimizer excludes them via the param-group labeling.

    frozen=False + use_running_average=False: normalize with global-batch
    stats and update running stats with `momentum` (torch convention:
    new = (1 - momentum) * old + momentum * batch).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    frozen: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if self.frozen or use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                # torch tracks the unbiased variance in running stats
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        scale = gamma * jax.lax.rsqrt(var + self.eps)
        return x * scale + (beta - mean * scale)


class Dropout2d(nn.Module):
    """Channel dropout (zeroes whole feature maps), matching
    `torch.nn.Dropout2d` used at resnet38d.py:64,68 and
    resnet38_contrast.py:14."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0)


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    padding: int | None = None,
    use_bias: bool = False,
    name: str | None = None,
    kernel_init: Callable = nn.initializers.he_normal(),
) -> nn.Conv:
    """torch-style Conv2d: explicit symmetric padding (default 'same' for the
    dilated kernel), NHWC."""
    if padding is None:
        padding = dilation * (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        name=name,
        kernel_init=kernel_init,
    )


def xavier_uniform(gain: float = 1.0) -> Callable:
    """torch.nn.init.xavier_uniform_ with gain, for HWIO conv kernels."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
        a = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init
