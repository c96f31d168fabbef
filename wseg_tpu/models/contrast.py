"""SEAM + pixel-to-prototype contrast network.

Rebuild of `network/resnet38_contrast.py`: ResNet-38 backbone, `fc8` 1x1 CAM
head (4096->21), 128-d projection head `fc_proj` (:16,34-36), PCM refinement
over concat[img_down, f8_3(conv4), f8_4(conv5)] -> f9 195->192 (:50-56).
Unlike the SEAM baseline, PCM here keeps gradients (:56).

Returns (cam, cam_rv, f_proj, cam_rv_down) like the reference forward (:61),
with cam/cam_rv bilinearly upsampled (align_corners=True) to the input size.
NHWC layout throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wseg_tpu.models.layers import Dropout2d, conv, xavier_uniform
from wseg_tpu.models.resnet38 import ResNet38, valid_mask
from wseg_tpu.ops.cam import cam_bg_complete
from wseg_tpu.ops.pcm import pcm
from wseg_tpu.ops.resize import resize_bilinear, resize_bilinear_valid
from wseg_tpu.utils.registry import MODELS


@MODELS.register("contrast")
class ContrastNet(nn.Module):
    num_classes: int = 21
    proj_dim: int = 128
    # inference-only: route PCM through the fused Pallas kernel
    # (kernels/pcm_pallas.py) that never materializes the hw x hw affinity;
    # training always uses the differentiable XLA formulation
    fused_pcm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, raw_cam: bool = False,
                 valid_hw: jax.Array | None = None):
        """raw_cam=True: return the stride-8 (cam, cam_rv_down) pair without
        the final upsamples — the efficient inference path. NB: CAM seed
        inference consumes the PCM-REFINED cam_rv (`_, cam, ... = model(img)`
        unpacks the second output, contrast_infer.py:61-62); callers resize
        cam_rv_down to the view size (align_corners=True, matching :57-58)
        and then to the original image size (align_corners=False, :62).

        valid_hw (N, 2): per-sample valid sizes when the batch is zero-padded
        to a bucketed shape. Pad pixels are excluded from every global
        interaction (backbone pad halo, CAM spatial max, PCM affinity), so
        each sample's valid stride-8 output equals its exact-shape forward.
        Inference-path only (requires raw_cam=True)."""
        n, h_in, w_in, _ = x.shape
        d = ResNet38(name="backbone")(x, train=train, valid_hw=valid_hw)
        fea = Dropout2d(0.5, name="dropout7")(d["conv6"], deterministic=not train)

        f_proj = jax.nn.relu(
            conv(self.proj_dim, 1, kernel_init=xavier_uniform(), name="fc_proj")(fea)
        )
        cam = conv(self.num_classes, 1, kernel_init=xavier_uniform(), name="fc8")(fea)
        h, w = cam.shape[1:3]

        m8 = None
        if valid_hw is not None:
            assert raw_cam, "valid_hw is an inference-path (raw_cam) feature"
            m8 = valid_mask(valid_hw, (h, w), 8)

        # detached CAM -> normalized + bg-completed + per-pixel fg argmax
        cam_d_norm = cam_bg_complete(jax.lax.stop_gradient(cam), mask=m8)

        f8_3 = jax.nn.relu(conv(64, 1, name="f8_3")(jax.lax.stop_gradient(d["conv4"])))
        f8_4 = jax.nn.relu(conv(128, 1, name="f8_4")(jax.lax.stop_gradient(d["conv5"])))
        if valid_hw is None:
            x_s = resize_bilinear(x, (h, w), align_corners=True)
        else:
            # per-sample valid-region resize: the padded-buffer equivalent of
            # F.interpolate(x_exact, (h8, w8)) for each sample
            valid8 = (valid_hw + 7) // 8
            x_s = resize_bilinear_valid(x, (h, w), valid_hw, valid8)
        f = jnp.concatenate([x_s, f8_3, f8_4], axis=-1)  # 3+64+128 = 195
        f = conv(192, 1, kernel_init=xavier_uniform(gain=4.0), name="f9")(f)

        if self.fused_pcm and not train and m8 is None:
            from wseg_tpu.kernels.pcm_pallas import pcm_fused_nhwc

            cam_rv_down = pcm_fused_nhwc(cam_d_norm, f)
        else:
            cam_rv_down = pcm(cam_d_norm, f, mask=m8)
        if raw_cam:
            return cam, cam_rv_down
        cam_rv = resize_bilinear(cam_rv_down, (h_in, w_in), align_corners=True)
        cam_up = resize_bilinear(cam, (h_in, w_in), align_corners=True)

        return cam_up, cam_rv, f_proj, cam_rv_down
