"""Modified aligned Xception-65 backbone (NHWC Flax).

Rebuild of `segmentation/lib/net/backbone/xception.py` (registered in the
reference but unused by its experiments): entry conv1/conv2, 20 separable
blocks with stride list per output stride (os=8 -> [2,2,1], dilation rate
16/os in the middle/exit flow), exit conv3-5 to 2048 channels. Returns
[l1, l2, l4] feature taps (hook layers of block2/block3 + final), matching
the list contract `backbone(x)[-1]` / `[0]` used by the DeepLab heads.

`inplace=False` relu quirks of the torch version are no-ops functionally and
not replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import BatchNorm2d, conv
from wseg_tpu.models.resnet38 import apply_mask as _apply, valid_mask
from wseg_tpu.utils.registry import BACKBONES


class SeparableConv(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    activate_first: bool = True
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        """mask: optional valid-region mask at the INPUT resolution, applied
        right before the depthwise conv — the only op here that reads
        neighbors. The 1x1 pointwise keeps pad-halo garbage in halo lanes,
        so it needs no re-zeroing (same exactness scheme as seg/backbones.py)."""
        bn = lambda f, name: BatchNorm2d(f, momentum=self.bn_mom, frozen=False, name=name)
        if self.activate_first:
            x = jax.nn.relu(x)
        x = _apply(x, mask)
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.in_ch, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.in_ch, use_bias=False, name="depthwise",
        )(x)
        x = bn(self.in_ch, "bn1")(x, use_running_average=not train)
        if not self.activate_first:
            x = jax.nn.relu(x)
        x = conv(self.out_ch, 1, name="pointwise")(x)
        x = bn(self.out_ch, "bn2")(x, use_running_average=not train)
        if not self.activate_first:
            x = jax.nn.relu(x)
        return x


class XBlock(nn.Module):
    in_ch: int
    out_ch: int
    stride: int = 1
    atrous: int | tuple = 1
    grow_first: bool = True
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False, mask_in=None):
        at = self.atrous if isinstance(self.atrous, (tuple, list)) else (self.atrous,) * 3
        if self.out_ch != self.in_ch or self.stride != 1:
            skip = conv(self.out_ch, 1, self.stride, name="skip")(x)
            skip = BatchNorm2d(self.out_ch, momentum=self.bn_mom, frozen=False,
                               name="skipbn")(skip, use_running_average=not train)
        else:
            skip = x
        filters = self.out_ch if self.grow_first else self.in_ch
        h = SeparableConv(self.in_ch, filters, dilation=at[0], bn_mom=self.bn_mom,
                          name="sepconv1")(x, train=train, mask=mask_in)
        h = SeparableConv(filters, self.out_ch, dilation=at[1], bn_mom=self.bn_mom,
                          name="sepconv2")(h, train=train, mask=mask_in)
        # the low-level tap the reference exposes via hook_layer; masked so
        # the head's 3x3 convs read exact zeros in the halo
        hook = _apply(h, mask_in)
        h = SeparableConv(self.out_ch, self.out_ch, stride=self.stride,
                          dilation=at[2], bn_mom=self.bn_mom, name="sepconv3")(
                              h, train=train, mask=mask_in)
        return h + skip, hook


class Xception(nn.Module):
    os: int = 8
    bn_mom: float = 0.1

    OUTPUT_DIM: int = 2048
    MIDDLE_DIM: int = 256

    @property
    def feature_strides(self) -> tuple:
        # stride of each returned tap [l1, l2, exit]: XBlock taps are
        # pre-stride (the reference's hook_layer), so l1/l2 sit at the
        # block INPUT strides; stride_list[0] is 2 for both os=8 and os=16
        return (4, 8, self.os)

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        assert self.os in (8, 16), self.os
        stride_list = (2, 1, 1) if self.os == 8 else (2, 2, 1)
        rate = 16 // self.os
        bn = lambda f, name: BatchNorm2d(f, momentum=self.bn_mom, frozen=False, name=name)

        n, h0, w0, _ = x.shape

        def mask(stride: int):
            if valid_hw is None:
                return None
            hw = (-(-h0 // stride), -(-w0 // stride))
            return valid_mask(valid_hw, hw, stride)

        x = conv(32, 3, 2, padding=1, name="conv1")(x)
        x = _apply(jax.nn.relu(bn(32, "bn1")(x, use_running_average=not train)), mask(2))
        x = conv(64, 3, 1, padding=1, name="conv2")(x)
        x = jax.nn.relu(bn(64, "bn2")(x, use_running_average=not train))

        s = [2, 4, 4 * stride_list[0], 4 * stride_list[0] * stride_list[1]]
        s3 = s[3] * stride_list[2]
        # NB: block outputs keep pad-halo garbage in the residual sum; every
        # consumer (the next block's sepconvs, the exit sepconvs, the head)
        # masks its own input, so no output mask is needed here.
        x, _ = XBlock(64, 128, 2, bn_mom=self.bn_mom, name="block1")(
            x, train=train, mask_in=mask(s[0]))
        x, l1 = XBlock(128, 256, stride_list[0], bn_mom=self.bn_mom, name="block2")(
            x, train=train, mask_in=mask(s[1]))
        x, l2 = XBlock(256, 728, stride_list[1], bn_mom=self.bn_mom, name="block3")(
            x, train=train, mask_in=mask(s[2]))
        for i in range(4, 20):
            x, _ = XBlock(728, 728, 1, atrous=rate, bn_mom=self.bn_mom,
                          name=f"block{i}")(x, train=train, mask_in=mask(s[3]))
        x, _ = XBlock(728, 1024, stride_list[2], atrous=rate, grow_first=False,
                      bn_mom=self.bn_mom, name="block20")(x, train=train, mask_in=mask(s[3]))

        x = SeparableConv(1024, 1536, dilation=rate, activate_first=False,
                          bn_mom=self.bn_mom, name="conv3")(x, train=train, mask=mask(s3))
        x = SeparableConv(1536, 1536, dilation=rate, activate_first=False,
                          bn_mom=self.bn_mom, name="conv4")(x, train=train, mask=mask(s3))
        x = SeparableConv(1536, 2048, dilation=rate, activate_first=False,
                          bn_mom=self.bn_mom, name="conv5")(x, train=train, mask=mask(s3))
        return [l1, l2, _apply(x, mask(s3))]


@BACKBONES.register("xception")
def xception(bn_mom: float = 0.1):
    return Xception(bn_mom=bn_mom)
