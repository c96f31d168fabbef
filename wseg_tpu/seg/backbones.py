"""Stage-3 backbones: dilated ResNet family + the ResNet-38 variant.

Rebuild of `segmentation/lib/net/backbone/resnet.py` (dilated pre-trained
ResNet with deep_base 3x3x3 stem, stride-8 via dilation 2/4 in layers 3/4,
optional multi-grid [3,4,5]) and `backbone/resnet38d.py` (the same WideResNet
returning [conv4, conv5, conv6]). All NHWC Flax with trainable BatchNorm
(global-batch stats under jit = SyncBN on a mesh; see models/layers.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import BatchNorm2d, conv
from wseg_tpu.models.resnet38 import apply_mask as _apply, ResNet38, valid_mask
from wseg_tpu.utils.registry import BACKBONES


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    previous_dilation: int = 1
    downsample: bool = False
    bn_mom: float = 0.1
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask_out=None):
        """mask_out: optional (N, H', W', 1) valid-region mask at the output
        (post-stride) resolution. Post-activation ResNet: BN injects its bias
        into zero-padded ("pad halo") positions; re-zeroing after every relu
        makes each conv see exactly the zeros that exact-shape SAME padding
        would supply, so bucketed == exact on the valid region (same scheme
        as the stage-1 backbone, models/resnet38.py)."""
        bn = partial(BatchNorm2d, momentum=self.bn_mom, frozen=False)
        residual = x
        out = conv(self.planes, 3, self.stride, dilation=self.dilation,
                   padding=self.dilation, name="conv1")(x)
        out = bn(self.planes, name="bn1")(out, use_running_average=not train)
        out = _apply(jax.nn.relu(out), mask_out)
        out = conv(self.planes, 3, dilation=self.previous_dilation,
                   padding=self.previous_dilation, name="conv2")(out)
        out = bn(self.planes, name="bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = conv(self.planes, 1, self.stride, name="downsample_conv")(x)
            residual = bn(self.planes, name="downsample_bn")(
                residual, use_running_average=not train
            )
        return _apply(jax.nn.relu(out + residual), mask_out)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    previous_dilation: int = 1  # unused (basic-block compat)
    downsample: bool = False
    bn_mom: float = 0.1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, mask_in=None, mask_out=None):
        """mask_in/mask_out: valid-region masks at input / post-stride
        resolution (see BasicBlock; the stride sits on conv2 here, so the
        first relu is still at input resolution)."""
        bn = partial(BatchNorm2d, momentum=self.bn_mom, frozen=False)
        residual = x
        out = conv(self.planes, 1, name="conv1")(x)
        out = bn(self.planes, name="bn1")(out, use_running_average=not train)
        out = _apply(jax.nn.relu(out), mask_in)
        out = conv(self.planes, 3, self.stride, dilation=self.dilation,
                   padding=self.dilation, name="conv2")(out)
        out = bn(self.planes, name="bn2")(out, use_running_average=not train)
        out = _apply(jax.nn.relu(out), mask_out)
        out = conv(self.planes * 4, 1, name="conv3")(out)
        out = bn(self.planes * 4, name="bn3")(out, use_running_average=not train)
        if self.downsample:
            residual = conv(self.planes * 4, 1, self.stride, name="downsample_conv")(x)
            residual = bn(self.planes * 4, name="downsample_bn")(
                residual, use_running_average=not train
            )
        return _apply(jax.nn.relu(out + residual), mask_out)


class DilatedResNet(nn.Module):
    """Returns [l1, l2, l3, l4] like the reference's ResNet.forward."""

    block: type
    layers: Sequence[int]
    dilated: bool = True
    multi_grid: bool = False
    deep_base: bool = True
    bn_mom: float = 0.1

    OUTPUT_DIM: int = 2048
    MIDDLE_DIM: int = 256

    @property
    def feature_strides(self) -> tuple:
        # stride of each returned tap [l1, l2, l3, l4]
        return (4, 8, 8, 8) if self.dilated else (4, 8, 16, 32)

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        n, h0, w0, _ = x.shape

        def mask(stride: int):
            if valid_hw is None:
                return None
            hw = (-(-h0 // stride), -(-w0 // stride))
            return valid_mask(valid_hw, hw, stride)

        bn = partial(BatchNorm2d, momentum=self.bn_mom, frozen=False)
        if self.deep_base:
            x = conv(64, 3, 2, padding=1, name="conv1_0")(x)
            x = bn(64, name="conv1_bn0")(x, use_running_average=not train)
            x = _apply(jax.nn.relu(x), mask(2))
            x = conv(64, 3, 1, padding=1, name="conv1_1")(x)
            x = bn(64, name="conv1_bn1")(x, use_running_average=not train)
            x = _apply(jax.nn.relu(x), mask(2))
            x = conv(128, 3, 1, padding=1, name="conv1_2")(x)
            inplanes = 128
        else:
            x = conv(64, 7, 2, padding=3, name="conv1")(x)
            inplanes = 64
        x = bn(inplanes, name="bn1")(x, use_running_average=not train)
        x = _apply(jax.nn.relu(x), mask(2))
        # maxpool k3 s2 p1. Valid outputs are pad-safe post-relu (halo zeros
        # never beat an in-bounds max of non-negative values), but HALO
        # outputs pick up valid values through the window overlap — re-zero
        # them before the first 3x3 block conv reads the halo.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = _apply(x, mask(4))

        exp = self.block.expansion

        def make_layer(x, planes, blocks, stride, dilation, name, inplanes,
                       stride_in, stride_out):
            # multi-grid first-block dilations per the reference [3,4,5]
            multi_dil = (3, 4, 5)
            m_in, m_out = mask(stride_in), mask(stride_out)
            block_kwargs = (
                {"mask_in": m_in, "mask_out": m_out}
                if self.block is Bottleneck else {"mask_out": m_out}
            )
            later_kwargs = (
                {"mask_in": m_out, "mask_out": m_out}
                if self.block is Bottleneck else {"mask_out": m_out}
            )
            for i in range(blocks):
                if i == 0:
                    first_dil = (
                        multi_dil[0] if (self.multi_grid and name == "layer4")
                        else (1 if dilation in (1, 2) else 2)
                    )
                    down = stride != 1 or inplanes != planes * exp
                    x = self.block(
                        planes, stride=stride, dilation=first_dil,
                        previous_dilation=dilation, downsample=down,
                        bn_mom=self.bn_mom, name=f"{name}_0",
                    )(x, train=train, **block_kwargs)
                else:
                    dil = (
                        multi_dil[min(i, 2)]
                        if (self.multi_grid and name == "layer4")
                        else dilation
                    )
                    x = self.block(
                        planes, dilation=dil, previous_dilation=dilation,
                        bn_mom=self.bn_mom, name=f"{name}_{i}",
                    )(x, train=train, **later_kwargs)
                inplanes = planes * exp
            return x, inplanes

        l1, inplanes = make_layer(x, 64, self.layers[0], 1, 1, "layer1", inplanes, 4, 4)
        l2, inplanes = make_layer(l1, 128, self.layers[1], 2, 1, "layer2", inplanes, 4, 8)
        if self.dilated:
            l3, inplanes = make_layer(l2, 256, self.layers[2], 1, 2, "layer3", inplanes, 8, 8)
            l4, inplanes = make_layer(l3, 512, self.layers[3], 1, 4, "layer4", inplanes, 8, 8)
        else:
            l3, inplanes = make_layer(l2, 256, self.layers[2], 2, 1, "layer3", inplanes, 8, 16)
            l4, inplanes = make_layer(l3, 512, self.layers[3], 2, 1, "layer4", inplanes, 16, 32)
        return [l1, l2, l3, l4]


class SegResNet38(nn.Module):
    """ResNet-38 backbone for segmentation: returns [conv4, conv5, conv6]
    (backbone/resnet38d.py:162-190). Reuses the stage-1 ResNet38 with
    `bn_frozen=False`: the reference's stage-3 experiment drivers never call
    `net.train()` (experiment/*/train.py — torch modules default to training
    mode), so the backbone's BN-freeze override (resnet38d.py:192-212) is
    dead code there and its BNs run in batch-statistics mode with the
    module-constant momentum 3e-4 (resnet38d.py:8) during training — the
    as-run behavior this module reproduces. conv1a likewise stays trainable
    (its `not_training` requires_grad freeze lives in the same uncalled
    override)."""

    OUTPUT_DIM: int = 4096
    MIDDLE_DIM: int = 1024

    # [conv4, conv5, conv6] all live on the stride-8 grid (dilated trunk)
    feature_strides: tuple = (8, 8, 8)

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        d = ResNet38(name="resnet38", bn_frozen=False)(
            x, train=train, valid_hw=valid_hw)
        return [d["conv4"], d["conv5"], d["conv6"]]


@BACKBONES.register("resnet38")
def resnet38_backbone(bn_mom: float = 0.1):
    return SegResNet38()


@BACKBONES.register("resnet18")
def resnet18(bn_mom: float = 0.1):
    return DilatedResNet(BasicBlock, (2, 2, 2, 2), bn_mom=bn_mom,
                         OUTPUT_DIM=512, MIDDLE_DIM=64)


@BACKBONES.register("resnet34")
def resnet34(bn_mom: float = 0.1):
    return DilatedResNet(BasicBlock, (3, 4, 6, 3), bn_mom=bn_mom,
                         OUTPUT_DIM=512, MIDDLE_DIM=64)


@BACKBONES.register("resnet50")
def resnet50(bn_mom: float = 0.1):
    return DilatedResNet(Bottleneck, (3, 4, 6, 3), bn_mom=bn_mom)


@BACKBONES.register("resnet101")
def resnet101(bn_mom: float = 0.1):
    return DilatedResNet(Bottleneck, (3, 4, 23, 3), bn_mom=bn_mom)


@BACKBONES.register("resnet152")
def resnet152(bn_mom: float = 0.1):
    return DilatedResNet(Bottleneck, (3, 8, 36, 3), bn_mom=bn_mom)


def build_backbone(name: str, bn_mom: float = 0.1):
    return BACKBONES.get(name)(bn_mom=bn_mom)
