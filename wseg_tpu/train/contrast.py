"""Stage-1 SEAM + pixel-to-prototype contrast training step.

Rebuild of the `contrast_train.py:126-399` hot loop as ONE jitted dual-view
step: both forwards (448^2 crop + 128^2 bilinear downscale), all SEAM losses
(cls / rvmin / ER / ECR), prototype estimation, and the three InfoNCE terms,
followed by the PolySGD update — a single XLA program per step. Under a
batch-sharded mesh the gradient all-reduce is inserted by GSPMD (replacing
`nn.DataParallel`, contrast_train.py:108).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from wseg_tpu.ops.cam import max_norm, max_onehot
from wseg_tpu.ops.losses import (
    adaptive_min_pooling_loss,
    ecr_loss,
    estimate_prototypes,
    info_nce,
    intra_view_nce,
    multilabel_soft_margin_loss,
    normalize_cam_for_prototypes,
)
from wseg_tpu.ops.resize import resize_bilinear


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array


def contrast_losses(
    outputs1,
    outputs2,
    label21: jax.Array,
    rngs: tuple[jax.Array, jax.Array],
    bg_threshold: float = 0.20,
    low_res: int = 128,
) -> dict[str, jax.Array]:
    """All stage-1 losses from the two view outputs.

    outputs*: (cam, cam_rv, f_proj, cam_rv_down) NHWC model outputs;
    label21: (N, 21) multi-hot incl. bg=1 (contrast_train.py:138-140).
    """
    cam1, cam_rv1, f_proj1, cam_rv1_down = outputs1
    cam2, cam_rv2, f_proj2, cam_rv2_down = outputs2
    lbl = label21[:, None, None, :]  # (N,1,1,21)

    # --- SEAM losses (contrast_train.py:142-174) ---
    label1 = cam1.mean(axis=(1, 2))  # adaptive_avg_pool2d -> (N, 21)
    label2 = cam2.mean(axis=(1, 2))
    loss_rvmin1 = adaptive_min_pooling_loss((cam_rv1 * lbl)[..., 1:])
    loss_rvmin2 = adaptive_min_pooling_loss((cam_rv2 * lbl)[..., 1:])

    cam1n = resize_bilinear(max_norm(cam1), (low_res, low_res), align_corners=True) * lbl
    cam_rv1n = resize_bilinear(max_norm(cam_rv1), (low_res, low_res), align_corners=True) * lbl
    cam2n = max_norm(cam2) * lbl
    cam_rv2n = max_norm(cam_rv2) * lbl

    loss_cls1 = multilabel_soft_margin_loss(label1[:, 1:], label21[:, 1:])
    loss_cls2 = multilabel_soft_margin_loss(label2[:, 1:], label21[:, 1:])

    loss_er = jnp.abs(cam1n[..., 1:] - cam2n[..., 1:]).mean()

    def bg_complete(c):
        bg = 1.0 - c[..., 1:].max(axis=-1, keepdims=True)
        return jnp.concatenate([bg, c[..., 1:]], axis=-1)

    cam1n = bg_complete(cam1n)
    cam2n = bg_complete(cam2n)

    loss_ecr1 = ecr_loss(max_onehot(jax.lax.stop_gradient(cam2n)), cam_rv1n)
    loss_ecr2 = ecr_loss(max_onehot(jax.lax.stop_gradient(cam1n)), cam_rv2n)
    loss_ecr = loss_ecr1 + loss_ecr2

    loss_cls = (loss_cls1 + loss_cls2) / 2 + (loss_rvmin1 + loss_rvmin2) / 2

    # --- contrast block (contrast_train.py:176-392) ---
    ds = low_res // 8  # 16
    f_proj1 = resize_bilinear(f_proj1, (ds, ds), align_corners=True)
    cam_rv1_down = resize_bilinear(cam_rv1_down, (ds, ds), align_corners=True)

    fea1 = jax.lax.stop_gradient(f_proj1)
    fea2 = jax.lax.stop_gradient(f_proj2)
    norm_cam1 = normalize_cam_for_prototypes(
        jax.lax.stop_gradient(cam_rv1_down), bg_threshold
    )
    norm_cam2 = normalize_cam_for_prototypes(
        jax.lax.stop_gradient(cam_rv2_down), bg_threshold
    )
    protos1, pl1 = estimate_prototypes(fea1, norm_cam1, label21)
    protos2, pl2 = estimate_prototypes(fea2, norm_cam2, label21)

    cf = f_proj1.shape[-1]
    f1 = f_proj1.reshape(-1, cf)
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True).clip(1e-12)
    f2 = f_proj2.reshape(-1, cf)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True).clip(1e-12)

    # 1.1 cross-prototype NCE (:259-269)
    loss_nce1 = info_nce(f1, protos2[pl1], protos2)
    loss_nce2 = info_nce(f2, protos1[pl2], protos1)
    loss_cross_nce = 0.1 * (loss_nce1 + loss_nce2) / 2

    # 1.2 cross-pseudo-label NCE (:271-281): swap the positives
    loss_cn2_1 = info_nce(f1, protos1[pl2], protos1)
    loss_cn2_2 = info_nce(f2, protos2[pl1], protos2)
    loss_cross_nce2 = 0.1 * (loss_cn2_1 + loss_cn2_2) / 2

    # 2. intra-view NCE with semi-hard mining + hard pixel sampling (:283-389)
    loss_intra1 = intra_view_nce(f1, protos1, pl1, rngs[0])
    loss_intra2 = intra_view_nce(f2, protos2, pl2, rngs[1])
    loss_intra_nce = 0.1 * (loss_intra1 + loss_intra2) / 2

    loss_nce = loss_cross_nce + loss_cross_nce2 + loss_intra_nce
    loss = loss_cls + loss_er + loss_ecr + loss_nce

    return {
        "loss": loss,
        "loss_cls": loss_cls,
        "loss_er": loss_er,
        "loss_ecr": loss_ecr,
        "loss_nce": loss_nce,
        "loss_intra_nce": loss_intra_nce,
        "loss_cross_nce": loss_cross_nce,
        "loss_cross_nce2": loss_cross_nce2,
    }


def make_train_step(model, tx, bg_threshold: float = 0.20, low_res: int = 128,
                    compute_dtype=None):
    """Build the jitted train step.

    step(state, img (N,H,W,3), label (N,20)) -> (state, metrics)

    compute_dtype=jnp.bfloat16 enables mixed precision: the forward/backward
    runs with bf16 params and activations (MXU-native), losses in f32,
    gradients cast back to f32 for the optimizer (f32 master weights). Off by
    default — reference parity is f32.
    """

    def train_step(state: TrainState, img: jax.Array, label: jax.Array):
        rng, k_d1, k_d2, k_i1, k_i2 = jax.random.split(state.rng, 5)
        n = img.shape[0]
        label21 = jnp.concatenate([jnp.ones((n, 1), label.dtype), label], axis=1)
        img2 = resize_bilinear(img, (low_res, low_res), align_corners=True)

        def loss_fn(params):
            if compute_dtype is not None:
                params = jax.tree.map(
                    lambda p: p.astype(compute_dtype)
                    if p.dtype == jnp.float32 else p, params
                )
                x1 = img.astype(compute_dtype)
                x2 = img2.astype(compute_dtype)
            else:
                x1, x2 = img, img2
            variables = {"params": params, "batch_stats": state.batch_stats}
            out1 = model.apply(variables, x1, train=True, rngs={"dropout": k_d1})
            out2 = model.apply(variables, x2, train=True, rngs={"dropout": k_d2})
            if compute_dtype is not None:
                out1 = tuple(o.astype(jnp.float32) for o in out1)
                out2 = tuple(o.astype(jnp.float32) for o in out2)
            metrics = contrast_losses(
                out1, out2, label21, (k_i1, k_i2), bg_threshold, low_res
            )
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        if compute_dtype is not None:
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params, opt_state, state.batch_stats, rng)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
