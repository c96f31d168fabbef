"""Dilated WideResNet-38 (A1) backbone, output stride 8, NHWC.

TPU-native rebuild of `network/resnet38d.py:6-189`:
* pre-activation residual blocks (`ResBlock` :6-52, bottleneck
  `ResBlock_bot` :54-102 with channel dropout)
* stride-8 via dilation 2 (b5*) and 4 (b6/b7)
* `forward_as_dict` taps conv3/conv4/conv5/conv6 — the bn+relu of the b4/b5/
  b6 block inputs and the final bn7+relu 4096-ch feature.

BatchNorms are frozen by default (constants from running stats) exactly as
the reference forces in `Net.train` for the stage-1/2 trainers
(resnet38d.py:207-212, applied via contrast_train.py / aff_train.py calling
`model.train()`). The stage-3 segmentation experiments never call
`net.train()` (experiment/*/train.py — torch modules default to training
mode), so THERE the same backbone runs its BN in batch-statistics mode with
momentum 3e-4; `bn_frozen=False` reproduces that as-run behavior
(seg/backbones.py:SegResNet38). Parameter names mirror the reference
state_dict keys so the torch/mxnet weight converters are a pure rename.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import BatchNorm2d, Dropout2d, conv

# (mean, std) of the reference's input normalization (resnet38d.py:104-118)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(img_uint8) -> jnp.ndarray:
    """HWC uint8 -> normalized float32 (host- or device-side)."""
    import numpy as np

    arr = np.asarray(img_uint8, dtype=np.float32) / 255.0
    return (arr - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )


class ResBlock(nn.Module):
    """Pre-activation basic block: bn-relu -> [1x1 shortcut if reshaping]
    + conv3x3(stride, first_dilation) - bn-relu - conv3x3(dilation)."""

    in_channels: int
    mid_channels: int
    out_channels: int
    stride: int = 1
    first_dilation: int | None = None
    dilation: int = 1
    bn_frozen: bool = True
    bn_mom: float = 3e-4  # resnet38d.py:8 module constant

    @nn.compact
    def __call__(self, x, *, train: bool = False, get_x_bn_relu: bool = False,
                 mask_in=None, mask_out=None):
        """mask_in/mask_out: optional (N, H, W, 1) valid-region masks at the
        input / post-stride resolution. BN injects its bias into padded
        ("pad halo") positions; re-zeroing the halo right after each
        bn+relu makes every conv see exactly the zeros that exact-shape SAME
        padding would supply — bucketed forward == exact forward."""
        same_shape = self.in_channels == self.out_channels and self.stride == 1
        fd = self.first_dilation if self.first_dilation is not None else self.dilation

        def bn(features, name):
            return BatchNorm2d(
                features, momentum=self.bn_mom, frozen=self.bn_frozen, name=name
            )

        branch2 = bn(self.in_channels, "bn_branch2a")(
            x, use_running_average=not train)
        branch2 = jax.nn.relu(branch2)
        if mask_in is not None:
            branch2 = branch2 * mask_in
        x_bn_relu = branch2

        if not same_shape:
            branch1 = conv(self.out_channels, 1, self.stride, name="conv_branch1")(branch2)
        else:
            branch1 = x

        branch2 = conv(
            self.mid_channels, 3, self.stride, dilation=fd, padding=fd,
            name="conv_branch2a",
        )(branch2)
        branch2 = bn(self.mid_channels, "bn_branch2b1")(
            branch2, use_running_average=not train)
        branch2 = jax.nn.relu(branch2)
        if mask_out is not None:
            branch2 = branch2 * mask_out
        branch2 = conv(
            self.out_channels, 3, dilation=self.dilation, padding=self.dilation,
            name="conv_branch2b1",
        )(branch2)

        out = branch1 + branch2
        if get_x_bn_relu:
            return out, x_bn_relu
        return out


class ResBlockBot(nn.Module):
    """Pre-activation bottleneck with channel dropout
    (resnet38d.py:54-102). The 1x1 shortcut is unconditional."""

    in_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    bn_frozen: bool = True
    bn_mom: float = 3e-4

    @nn.compact
    def __call__(self, x, *, train: bool = False, get_x_bn_relu: bool = False,
                 mask_in=None, mask_out=None):
        def bn(features, name):
            return BatchNorm2d(
                features, momentum=self.bn_mom, frozen=self.bn_frozen, name=name
            )

        branch2 = bn(self.in_channels, "bn_branch2a")(
            x, use_running_average=not train)
        branch2 = jax.nn.relu(branch2)
        if mask_in is not None:
            branch2 = branch2 * mask_in
        x_bn_relu = branch2

        branch1 = conv(self.out_channels, 1, self.stride, name="conv_branch1")(branch2)

        branch2 = conv(self.out_channels // 4, 1, self.stride, name="conv_branch2a")(branch2)
        branch2 = bn(self.out_channels // 4, "bn_branch2b1")(
            branch2, use_running_average=not train)
        branch2 = jax.nn.relu(branch2)
        if mask_out is not None:
            branch2 = branch2 * mask_out
        branch2 = Dropout2d(self.dropout, name="dropout_2b1")(branch2, deterministic=not train)
        branch2 = conv(
            self.out_channels // 2, 3, dilation=self.dilation, padding=self.dilation,
            name="conv_branch2b1",
        )(branch2)
        branch2 = bn(self.out_channels // 2, "bn_branch2b2")(
            branch2, use_running_average=not train)
        branch2 = jax.nn.relu(branch2)
        if mask_out is not None:
            branch2 = branch2 * mask_out
        branch2 = Dropout2d(self.dropout, name="dropout_2b2")(branch2, deterministic=not train)
        branch2 = conv(self.out_channels, 1, name="conv_branch2b2")(branch2)

        out = branch1 + branch2
        if get_x_bn_relu:
            return out, x_bn_relu
        return out


def apply_mask(x, mask):
    """Re-zero the pad halo (no-op without a mask) — the primitive the whole
    bucketed-exactness scheme is built from (see ResBlock.__call__)."""
    return x if mask is None else x * mask


def valid_mask(valid_hw: jax.Array, hw: tuple[int, int], stride: int) -> jax.Array:
    """(N, H, W, 1) float mask of each sample's valid region at `stride`.

    valid_hw: (N, 2) int input-resolution valid sizes; hw: static (padded)
    spatial dims at this stride. Valid extent at stride s is ceil(v/s) — the
    exact output size chain of the stride-2 convs (k3, p1: ceil(H/2))."""
    h, w = hw
    vh = (valid_hw[:, 0] + stride - 1) // stride  # (N,)
    vw = (valid_hw[:, 1] + stride - 1) // stride
    rows = jnp.arange(h)[None, :, None] < vh[:, None, None]  # (N, H, 1)
    cols = jnp.arange(w)[None, None, :] < vw[:, None, None]  # (N, 1, W)
    return (rows & cols)[..., None].astype(jnp.float32)


class ResNet38(nn.Module):
    """Backbone returning the {conv3, conv4, conv5, conv6} tap dict
    (resnet38d.py:160-189).

    `valid_hw` (N, 2) marks per-sample valid regions when the batch is
    zero-padded to a common (bucketed) shape: the pad halo is re-zeroed after
    every bn+relu so valid outputs equal the exact-shape forward (see
    ResBlock.__call__)."""

    bn_frozen: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 valid_hw: jax.Array | None = None) -> dict[str, jax.Array]:
        n, h0, w0, _ = x.shape
        from functools import partial

        RB = partial(ResBlock, bn_frozen=self.bn_frozen)
        RBB = partial(ResBlockBot, bn_frozen=self.bn_frozen)

        def mask(stride: int):
            if valid_hw is None:
                return None
            hw = (-(-h0 // stride), -(-w0 // stride))
            return valid_mask(valid_hw, hw, stride)

        m1, m2, m4, m8 = mask(1), mask(2), mask(4), mask(8)

        x = conv(64, 3, padding=1, name="conv1a")(x)

        x = RB(64, 128, 128, stride=2, name="b2")(
            x, train=train, mask_in=m1, mask_out=m2)
        x = RB(128, 128, 128, name="b2_1")(
            x, train=train, mask_in=m2, mask_out=m2)
        x = RB(128, 128, 128, name="b2_2")(
            x, train=train, mask_in=m2, mask_out=m2)

        x = RB(128, 256, 256, stride=2, name="b3")(
            x, train=train, mask_in=m2, mask_out=m4)
        x = RB(256, 256, 256, name="b3_1")(
            x, train=train, mask_in=m4, mask_out=m4)
        x = RB(256, 256, 256, name="b3_2")(
            x, train=train, mask_in=m4, mask_out=m4)

        x, conv3 = RB(256, 512, 512, stride=2, name="b4")(
            x, train=train, get_x_bn_relu=True, mask_in=m4, mask_out=m8
        )
        x = RB(512, 512, 512, name="b4_1")(
            x, train=train, mask_in=m8, mask_out=m8)
        x = RB(512, 512, 512, name="b4_2")(
            x, train=train, mask_in=m8, mask_out=m8)
        x = RB(512, 512, 512, name="b4_3")(
            x, train=train, mask_in=m8, mask_out=m8)
        x = RB(512, 512, 512, name="b4_4")(
            x, train=train, mask_in=m8, mask_out=m8)
        x = RB(512, 512, 512, name="b4_5")(
            x, train=train, mask_in=m8, mask_out=m8)

        x, conv4 = RB(
            512, 512, 1024, stride=1, first_dilation=1, dilation=2, name="b5"
        )(x, train=train, get_x_bn_relu=True, mask_in=m8, mask_out=m8)
        x = RB(1024, 512, 1024, dilation=2, name="b5_1")(
            x, train=train, mask_in=m8, mask_out=m8)
        x = RB(1024, 512, 1024, dilation=2, name="b5_2")(
            x, train=train, mask_in=m8, mask_out=m8)

        x, conv5 = RBB(1024, 2048, dilation=4, dropout=0.3, name="b6")(
            x, train=train, get_x_bn_relu=True, mask_in=m8, mask_out=m8
        )
        x = RBB(2048, 4096, dilation=4, dropout=0.5, name="b7")(
            x, train=train, mask_in=m8, mask_out=m8)

        conv6 = jax.nn.relu(
            BatchNorm2d(4096, momentum=3e-4, frozen=self.bn_frozen, name="bn7")(
                x, use_running_average=not train
            )
        )
        if m8 is not None:
            conv6 = conv6 * m8

        return {"conv3": conv3, "conv4": conv4, "conv5": conv5, "conv6": conv6}
