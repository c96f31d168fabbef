"""DeepLab v1/v2/v3/v3+ heads and the ASPP / PPM operators, NHWC Flax.

Rebuild of `segmentation/lib/net/{deeplabv1,deeplabv2,deeplabv3,
deeplabv3plus}.py` and `operators/{ASPP,PPM}.py`. BN is trainable
(global-batch stats under jit = SyncBN over the mesh), momentum
TRAIN_BN_MOM; the reference's `get_parameter_groups` only optimizes Conv
weights/biases (deeplabv1.py:53-69) — BN affine stays at init — which our
optimizer labeling reproduces (see `seg_param_labels`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import BatchNorm2d, conv
from wseg_tpu.models.resnet38 import apply_mask as _apply, valid_mask
from wseg_tpu.ops.resize import resize_bilinear
from wseg_tpu.seg.backbones import build_backbone
from wseg_tpu.seg.config import SegConfig
from wseg_tpu.utils.registry import MODELS


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    bn_mom: float = 0.1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = conv(self.features, self.kernel, dilation=self.dilation,
                 use_bias=self.use_bias, name="conv")(x)
        x = BatchNorm2d(self.features, momentum=self.bn_mom, frozen=False,
                        name="bn")(x, use_running_average=not train)
        return _apply(jax.nn.relu(x), mask)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (operators/ASPP.py:11-81): four dilated
    branches (+optional global pooling branch), concat, 1x1 + dropout.

    `mask`: optional (N, H, W, 1) valid-region mask for zero-pad-bucketed
    batches — branch outputs are re-zeroed in the pad halo and the global
    branch averages over the valid region only, so valid outputs equal the
    exact-shape forward."""

    dim_out: int
    rate: tuple = (1, 6, 12, 18)
    bn_mom: float = 0.1
    has_global: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        n, h, w, c = x.shape
        branches = []
        for i, r in enumerate(self.rate):
            k = 1 if (i == 0 and r == 0) else 3
            branches.append(
                ConvBNReLU(self.dim_out, k, dilation=max(r, 1), bn_mom=self.bn_mom,
                           name=f"branch{i + 1}")(x, train=train, mask=mask)
            )
        if self.has_global:
            if mask is None:
                g = x.mean(axis=(1, 2), keepdims=True)
            else:
                g = (x * mask).sum(axis=(1, 2), keepdims=True) / mask.sum(
                    axis=(1, 2), keepdims=True
                )
            g = conv(self.dim_out, 1, name="branch5_conv")(g)
            g = BatchNorm2d(self.dim_out, momentum=self.bn_mom, frozen=False,
                            name="branch5_bn")(g, use_running_average=not train)
            g = jax.nn.relu(g)
            g = jnp.broadcast_to(g, (n, h, w, self.dim_out))
            branches.append(g)
        cat = jnp.concatenate(branches, axis=-1)
        out = ConvBNReLU(self.dim_out, 1, bn_mom=self.bn_mom, name="conv_cat")(
            cat, train=train, mask=mask
        )
        if train:
            key = self.make_rng("dropout")
            keep = 0.5
            dmask = jax.random.bernoulli(key, keep, out.shape)
            out = jnp.where(dmask, out / keep, 0.0)
        return out


class PPM(nn.Module):
    """PSPNet pyramid pooling (operators/PPM.py:5-32) — registered but unused
    by the reference experiments; provided for completeness."""

    dim_out: int
    bins: tuple = (1, 2, 3, 6)
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        outs = [x]
        for i, b in enumerate(self.bins):
            # adaptive average pool to (b, b)
            ph, pw = h // b, w // b
            pooled = x[:, : ph * b, : pw * b].reshape(n, b, ph, b, pw, c).mean((2, 4))
            f = ConvBNReLU(self.dim_out, 1, bn_mom=self.bn_mom, name=f"bin{i}")(
                pooled, train=train
            )
            outs.append(resize_bilinear(f, (h, w), align_corners=True))
        return jnp.concatenate(outs, axis=-1)


@MODELS.register("deeplabv1")
class DeepLabV1(nn.Module):
    """deeplabv1.py:11-69: conv_fov 3x3 d12 -> 512, conv_fov2 1x1, dropout,
    cls_conv, bilinear up (align_corners=True)."""

    cfg: SegConfig

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None, raw_logits: bool = False):
        """valid_hw (N, 2): per-sample valid sizes when the batch is
        zero-pad-bucketed; the pad halo is re-zeroed through the backbone and
        head so valid outputs equal the exact-shape forward. With
        `raw_logits` the stride-8 logits are returned pre-upsample (the
        device-side bilinear over a PADDED grid maps differently than over
        the exact grid, so exact callers crop the valid stride-8 region and
        upsample host-side, cli/seg_test.py)."""
        n, h, w, _ = x.shape
        cfg = self.cfg
        backbone = build_backbone(cfg.MODEL_BACKBONE, bn_mom=cfg.TRAIN_BN_MOM)
        bb_kwargs = {} if valid_hw is None else {"valid_hw": valid_hw}
        feats = type(backbone)(name="backbone", **_attrs(backbone))(
            x, train=train, **bb_kwargs)
        bottom = feats[-1]
        m8 = _mask_for(valid_hw, (h, w), bottom.shape[1:3],
                       backbone.feature_strides[-1])
        f = conv(512, 3, dilation=12, padding=12, name="conv_fov")(bottom)
        f = BatchNorm2d(512, momentum=cfg.TRAIN_BN_MOM, frozen=False, name="bn_fov")(
            f, use_running_average=not train
        )
        f = _apply(jax.nn.relu(f), m8)
        f = conv(512, 1, name="conv_fov2")(f)
        f = BatchNorm2d(512, momentum=cfg.TRAIN_BN_MOM, frozen=False, name="bn_fov2")(
            f, use_running_average=not train
        )
        f = _apply(jax.nn.relu(f), m8)
        if train:
            key = self.make_rng("dropout")
            mask = jax.random.bernoulli(key, 0.5, f.shape)
            f = jnp.where(mask, f / 0.5, 0.0)
        out = conv(cfg.MODEL_NUM_CLASSES, 1, use_bias=True, name="cls_conv")(f)
        if raw_logits:
            return out
        return resize_bilinear(out, (h, w), align_corners=True)


@MODELS.register("deeplabv1_caffe")
class DeepLabV1Caffe(nn.Module):
    """deeplabv1.py:72-130 (`deeplabv1_caffe`): maxpool 3x3 s1 p1 on the
    backbone output, conv_fov 3x3 d12 -> 4096 (bias, no BN), dropout 0.5,
    conv_fov2 1x1 -> 4096, dropout 0.5, cls_conv, bilinear up
    (align_corners=True). Registered-but-unused by the reference experiment
    presets (like PPM); provided for registry parity. Its
    `from_scratch_layers` is only [cls_conv] (deeplabv1.py:88) — conv_fov /
    conv_fov2 join the PRETRAINED param groups, unlike deeplabv1
    (deeplabv1.py:28) — see FROM_SCRATCH / seg_param_labels."""

    cfg: SegConfig
    FROM_SCRATCH = ("cls_conv",)

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None, raw_logits: bool = False):
        """See DeepLabV1.__call__ for valid_hw / raw_logits semantics."""
        n, h, w, _ = x.shape
        cfg = self.cfg
        backbone = build_backbone(cfg.MODEL_BACKBONE, bn_mom=cfg.TRAIN_BN_MOM)
        bb_kwargs = {} if valid_hw is None else {"valid_hw": valid_hw}
        feats = type(backbone)(name="backbone", **_attrs(backbone))(
            x, train=train, **bb_kwargs)
        bottom = feats[-1]
        m8 = _mask_for(valid_hw, (h, w), bottom.shape[1:3],
                       backbone.feature_strides[-1])
        if m8 is None:
            f = nn.max_pool(bottom, (3, 3), strides=(1, 1), padding="SAME")
        else:
            # torch MaxPool2d pads with -inf; forcing the bucketed pad halo
            # to the same identity (then re-zeroing it) makes valid outputs
            # exactly equal the exact-shape forward for any backbone sign
            neg = jnp.finfo(bottom.dtype).min
            f = nn.max_pool(jnp.where(m8 > 0, bottom, neg),
                            (3, 3), strides=(1, 1), padding="SAME")
            f = jnp.where(m8 > 0, f, 0.0)
        f = _apply(jax.nn.relu(
            conv(4096, 3, dilation=12, padding=12, use_bias=True,
                 name="conv_fov")(f)), m8)
        if train:
            keep = 0.5
            dmask = jax.random.bernoulli(self.make_rng("dropout"), keep, f.shape)
            f = jnp.where(dmask, f / keep, 0.0)
        f = _apply(jax.nn.relu(
            conv(4096, 1, use_bias=True, name="conv_fov2")(f)), m8)
        if train:
            keep = 0.5
            dmask = jax.random.bernoulli(self.make_rng("dropout"), keep, f.shape)
            f = jnp.where(dmask, f / keep, 0.0)
        out = conv(cfg.MODEL_NUM_CLASSES, 1, use_bias=True, name="cls_conv")(f)
        if raw_logits:
            return out
        return resize_bilinear(out, (h, w), align_corners=True)


@MODELS.register("deeplabv2")
class DeepLabV2(nn.Module):
    """deeplabv2.py:40-59: ASPP rates [6,12,18,24] -> dropout -> cls_conv."""

    cfg: SegConfig

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None, raw_logits: bool = False):
        """See DeepLabV1.__call__ for valid_hw / raw_logits semantics."""
        n, h, w, _ = x.shape
        cfg = self.cfg
        backbone = build_backbone(cfg.MODEL_BACKBONE, bn_mom=cfg.TRAIN_BN_MOM)
        bb_kwargs = {} if valid_hw is None else {"valid_hw": valid_hw}
        feats = type(backbone)(name="backbone", **_attrs(backbone))(
            x, train=train, **bb_kwargs)
        m8 = _mask_for(valid_hw, (h, w), feats[-1].shape[1:3],
                       backbone.feature_strides[-1])
        f = ASPP(cfg.MODEL_ASPP_OUTDIM, rate=(6, 12, 18, 24),
                 bn_mom=cfg.TRAIN_BN_MOM, has_global=cfg.MODEL_ASPP_HASGLOBAL,
                 name="aspp")(feats[-1], train=train, mask=m8)
        if train:
            key = self.make_rng("dropout")
            mask = jax.random.bernoulli(key, 0.5, f.shape)
            f = jnp.where(mask, f / 0.5, 0.0)
        out = conv(cfg.MODEL_NUM_CLASSES, 1, use_bias=True, name="cls_conv")(f)
        if raw_logits:
            return out
        return resize_bilinear(out, (h, w), align_corners=True)


@MODELS.register("deeplabv3")
class DeepLabV3(nn.Module):
    """deeplabv3.py:40-53: ASPP rates [0,6,12,18] (1x1 first branch)."""

    cfg: SegConfig

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None, raw_logits: bool = False):
        """See DeepLabV1.__call__ for valid_hw / raw_logits semantics."""
        n, h, w, _ = x.shape
        cfg = self.cfg
        backbone = build_backbone(cfg.MODEL_BACKBONE, bn_mom=cfg.TRAIN_BN_MOM)
        bb_kwargs = {} if valid_hw is None else {"valid_hw": valid_hw}
        feats = type(backbone)(name="backbone", **_attrs(backbone))(
            x, train=train, **bb_kwargs)
        m8 = _mask_for(valid_hw, (h, w), feats[-1].shape[1:3],
                       backbone.feature_strides[-1])
        f = ASPP(cfg.MODEL_ASPP_OUTDIM, rate=(0, 6, 12, 18),
                 bn_mom=cfg.TRAIN_BN_MOM, has_global=cfg.MODEL_ASPP_HASGLOBAL,
                 name="aspp")(feats[-1], train=train, mask=m8)
        out = conv(cfg.MODEL_NUM_CLASSES, 1, use_bias=True, name="cls_conv")(f)
        if raw_logits:
            return out
        return resize_bilinear(out, (h, w), align_corners=True)


@MODELS.register("deeplabv3plus")
class DeepLabV3Plus(nn.Module):
    """deeplabv3plus.py:15-77: ASPP on l4 + 48-d low-level shortcut from l1,
    upsample-to-shortcut, cat_conv 3x3 x2, cls_conv."""

    cfg: SegConfig

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None, raw_logits: bool = False):
        """See DeepLabV1.__call__ for valid_hw / raw_logits semantics. NB:
        with valid_hw, the internal stride-8 -> stride-4 upsample still maps
        over the PADDED grid, so a one-cell interpolation bleed remains at the
        valid/pad boundary — bounded (unlike the unmasked contamination), but
        v3+ bucketed is approximate; v1/v2 are exact. The reference's
        experiments only use v1/v2."""
        n, h, w, _ = x.shape
        cfg = self.cfg
        backbone = build_backbone(cfg.MODEL_BACKBONE, bn_mom=cfg.TRAIN_BN_MOM)
        bb_kwargs = {} if valid_hw is None else {"valid_hw": valid_hw}
        feats = type(backbone)(name="backbone", **_attrs(backbone))(
            x, train=train, **bb_kwargs)
        l1, l4 = feats[0], feats[-1]
        m8 = _mask_for(valid_hw, (h, w), l4.shape[1:3],
                       backbone.feature_strides[-1])
        m4 = _mask_for(valid_hw, (h, w), l1.shape[1:3],
                       backbone.feature_strides[0])
        f = ASPP(cfg.MODEL_ASPP_OUTDIM, rate=(0, 6, 12, 18),
                 bn_mom=cfg.TRAIN_BN_MOM, has_global=cfg.MODEL_ASPP_HASGLOBAL,
                 name="aspp")(l4, train=train, mask=m8)
        f = resize_bilinear(f, l1.shape[1:3], align_corners=True)
        f = _apply(f, m4)
        sc = ConvBNReLU(cfg.MODEL_SHORTCUT_DIM, 3, bn_mom=cfg.TRAIN_BN_MOM,
                        name="shortcut_conv")(l1, train=train, mask=m4)
        f = jnp.concatenate([f, sc], axis=-1)
        f = ConvBNReLU(cfg.MODEL_ASPP_OUTDIM, 3, bn_mom=cfg.TRAIN_BN_MOM,
                       name="cat_conv1")(f, train=train, mask=m4)
        f = ConvBNReLU(cfg.MODEL_ASPP_OUTDIM, 3, bn_mom=cfg.TRAIN_BN_MOM,
                       name="cat_conv2")(f, train=train, mask=m4)
        out = conv(cfg.MODEL_NUM_CLASSES, 1, use_bias=True, name="cls_conv")(f)
        if raw_logits:
            return out
        return resize_bilinear(out, (h, w), align_corners=True)


def _mask_for(valid_hw, in_hw: tuple[int, int], feat_hw,
              stride: int) -> jax.Array | None:
    """Valid-region mask at the backbone's output resolution.

    `stride` is the backbone's declared output stride (its
    `.output_stride` — 8 for the dilated presets, 16 for xception os=16,
    32 for an undilated ResNet). It cannot be derived from shapes alone:
    several strides can reproduce the same padded (fh, fw) while
    disagreeing on the valid extents ceil(v/s) that the mask needs. The
    assert checks the declared stride is consistent with the feature
    shape actually produced."""
    if valid_hw is None:
        return None
    fh, fw = int(feat_hw[0]), int(feat_hw[1])
    assert (-(-in_hw[0] // stride), -(-in_hw[1] // stride)) == (fh, fw), (
        f"backbone output stride {stride} inconsistent with input {in_hw} "
        f"-> features {(fh, fw)}"
    )
    return valid_mask(valid_hw, (fh, fw), stride)


def _attrs(module: nn.Module) -> dict:
    return {
        f: getattr(module, f)
        for f in module.__dataclass_fields__
        if f not in ("name", "parent")
    }


def generate_net(cfg: SegConfig) -> nn.Module:
    """Registry-driven net factory (lib/net/generateNet.py:14-16)."""
    return MODELS.get(cfg.MODEL_NAME)(cfg=cfg)


def seg_param_labels(params: dict, scratch_mods: tuple | None = None) -> dict:
    """Param-group labels for stage-3 (deeplabv1.py:53-69 + seg train.py:71-80):
    conv weights/biases only; backbone = pretrained groups, head convs =
    scratch groups; BN affine never optimized (not collected by the
    reference's get_parameter_groups).

    `scratch_mods`: module names of the net's `from_scratch_layers` when they
    are NOT all the head convs — deeplabv1_caffe collects only cls_conv
    (deeplabv1.py:88), so its conv_fov/conv_fov2 take the pretrained lr/wd
    groups (pass the net class's FROM_SCRATCH)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        mods, leaf = path[:-1], path[-1]
        # every BatchNorm module in this package is named bn / bn1 / bn_fov /
        # branch5_bn / downsample_bn / conv1_bn0 ... — all contain "bn"
        if any("bn" in m for m in mods):
            return "frozen"
        in_backbone = mods and mods[0] == "backbone"
        is_bias = leaf == "bias"
        scratch = not in_backbone and (
            scratch_mods is None or any(m in scratch_mods for m in mods)
        )
        if not scratch:
            return "pretrained_b" if is_bias else "pretrained_w"
        return "scratch_b" if is_bias else "scratch_w"

    return walk(params, ())
