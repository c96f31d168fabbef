"""Baseline SEAM network (no projection head).

Rebuild of `network/resnet38_SEAM.py`: fc8 CAM head + PCM refinement, with
the whole PCM branch under stop_gradient (the reference wraps it in
`torch.no_grad()`, :36-52). Returns (cam, cam_rv) upsampled to input size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import Dropout2d, conv, xavier_uniform
from wseg_tpu.models.resnet38 import ResNet38
from wseg_tpu.ops.cam import cam_bg_complete
from wseg_tpu.ops.pcm import pcm
from wseg_tpu.ops.resize import resize_bilinear
from wseg_tpu.utils.registry import MODELS


@MODELS.register("seam")
class SEAMNet(nn.Module):
    num_classes: int = 21

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        n, h_in, w_in, _ = x.shape
        d = ResNet38(name="backbone")(x, train=train)
        fea = Dropout2d(0.5, name="dropout7")(d["conv6"], deterministic=not train)
        cam = conv(self.num_classes, 1, kernel_init=xavier_uniform(), name="fc8")(fea)
        h, w = cam.shape[1:3]

        cam_d_norm = cam_bg_complete(jax.lax.stop_gradient(cam))
        f8_3 = jax.nn.relu(conv(64, 1, name="f8_3")(jax.lax.stop_gradient(d["conv4"])))
        f8_4 = jax.nn.relu(conv(128, 1, name="f8_4")(jax.lax.stop_gradient(d["conv5"])))
        x_s = resize_bilinear(x, (h, w), align_corners=True)
        f = jnp.concatenate([x_s, f8_3, f8_4], axis=-1)
        f = conv(192, 1, kernel_init=xavier_uniform(gain=4.0), name="f9")(f)

        cam_rv_down = jax.lax.stop_gradient(pcm(cam_d_norm, f))
        cam_rv = resize_bilinear(cam_rv_down, (h_in, w_in), align_corners=True)
        cam_up = resize_bilinear(cam, (h_in, w_in), align_corners=True)
        return cam_up, cam_rv
