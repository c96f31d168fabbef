"""Stage-1 training losses, reformulated static-shape for XLA.

Covers every loss in `contrast_train.py`:
* `multilabel_soft_margin_loss` (torch F.multilabel_soft_margin_loss,
  contrast_train.py:159-160)
* `adaptive_min_pooling_loss` (:16-25)
* ER / ECR consistency losses (:163,168-172)
* prototype estimation via per-class CAM-confident top-k feature pooling
  (:182-241)
* cross-prototype / cross-pseudo-label InfoNCE (:259-281)
* intra-view InfoNCE with semi-hard prototype mining and per-class hard pixel
  sampling (:283-389)

The reference's per-class Python loops over boolean-masked, variable-length
tensors (:304-334) are GPU-sync-heavy and untraceable under jit; here they
become fixed-shape masked rank computations: for each class, member pixels
are ranked (a) by an i.i.d. uniform key — taking the `n_c//2` lowest ranks is
exactly a uniform sample without replacement — and (b) by similarity to the
positive prototype, keeping ranks [int(0.6 n_c) - n_c//2, int(0.6 n_c)),
i.e. the reference's "lowest-similarity band". Selection weights are summed
(a pixel picked by both paths counts twice, matching the reference's
concatenation), and the per-class mean is a masked weighted mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wseg_tpu.ops.topk import bottomk_relu_sum, topk_sum


def multilabel_soft_margin_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """mean_n mean_c [-(y log sigmoid(x) + (1-y) log sigmoid(-x))]."""
    loss = -(
        targets * jax.nn.log_sigmoid(logits)
        + (1.0 - targets) * jax.nn.log_sigmoid(-logits)
    )
    return loss.mean()


def adaptive_min_pooling_loss(x: jax.Array) -> jax.Array:
    """x: (N, H, W, C) foreground CAM slice. Per-sample: channel max, then
    the mean of the k = H*W//4 smallest (relu'd) spatial values. Selection by
    exact bit-bisection (ops/topk.py) instead of a 200k-element sort."""
    n, h, w, c = x.shape
    k = h * w // 4
    m = x.max(axis=-1).reshape(n, h * w)
    return bottomk_relu_sum(m, k) / (k * n)


def topk_mean(x: jax.Array, k: int) -> jax.Array:
    """Mean of the k largest entries per row of (N, M), then mean over rows —
    the ECR reduction (contrast_train.py:170-171). Exact sort-free selection."""
    n, m = x.shape
    return topk_sum(x, k).sum() / (k * n)


def ecr_loss(cam_other: jax.Array, cam_rv: jax.Array, frac: float = 0.2) -> jax.Array:
    """loss_ecr half: mean of top-20% |max_onehot(cam_other) - cam_rv|.
    Inputs (N, H, W, C); `cam_other` must already be max_onehot'd + detached."""
    n, h, w, c = cam_rv.shape
    diff = jnp.abs(cam_other - cam_rv).reshape(n, -1)
    k = int(c * h * w * frac)
    return topk_mean(diff, k)


def normalize_cam_for_prototypes(
    cam_rv_down: jax.Array, bg_threshold: float, e: float = 1e-5
) -> jax.Array:
    """Detached cam_rv normalization feeding prototype estimation
    (contrast_train.py:186-194): relu, per-(n,c) min/max, zero the entries at
    the min BEFORE shifting (they end up slightly negative, as in the
    reference), then overwrite the bg channel with `bg_threshold`."""
    cam = jax.nn.relu(cam_rv_down)
    n, h, w, c = cam.shape
    flat = cam.reshape(n, h * w, c)
    mx = flat.max(axis=1)[:, None, None, :]
    mn = flat.min(axis=1)[:, None, None, :]
    cam = jnp.where(cam < mn + e, 0.0, cam)
    cam = (cam - mn - e) / (mx - mn + e)
    bg = jnp.full_like(cam[..., :1], bg_threshold)
    return jnp.concatenate([bg, cam[..., 1:]], axis=-1)


def estimate_prototypes(
    fea: jax.Array, norm_cam: jax.Array, label: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-class CAM-weighted top-k feature pooling (contrast_train.py:195-209).

    fea: (N, H, W, Cf) detached projection features;
    norm_cam: (N, H, W, C) output of `normalize_cam_for_prototypes`;
    label: (N, C) multi-hot incl. bg.
    Returns (prototypes (C, Cf) L2-normalized, pseudo_label (N*H*W,) int32).
    """
    n, h, w, c = norm_cam.shape
    cf = fea.shape[-1]
    scores = jax.nn.softmax(norm_cam * label[:, None, None, :], axis=-1)
    pseudo_label = scores.argmax(axis=-1).reshape(-1).astype(jnp.int32)

    cam_flat = norm_cam.reshape(n * h * w, c).T  # (C, N*H*W)
    fea_flat = fea.reshape(n * h * w, cf)
    k = h * w // 8
    top_values, top_indices = jax.lax.top_k(cam_flat, k)  # (C, k)
    top_fea = fea_flat[top_indices]  # (C, k, Cf)
    protos = (top_values[..., None] * top_fea).sum(axis=1) / top_values.sum(
        axis=1, keepdims=True
    )
    protos = protos / jnp.linalg.norm(protos, axis=-1, keepdims=True).clip(1e-12)
    return protos, pseudo_label


def info_nce(
    f: jax.Array, positives: jax.Array, negatives: jax.Array, tau: float = 0.1
) -> jax.Array:
    """mean(-log(exp(<f,pos>/tau) / sum_c exp(<f, neg_c>/tau)))
    (contrast_train.py:261-267). f, positives: (M, Cf); negatives: (C, Cf)."""
    a1 = jnp.exp((f * positives).sum(axis=-1) / tau)
    a2 = jnp.exp(f @ negatives.T / tau).sum(axis=-1)
    return (-jnp.log(a1 / a2)).mean()


def intra_view_nce(
    f: jax.Array,
    prototypes: jax.Array,
    pseudo_label: jax.Array,
    rng: jax.Array,
    tau: float = 0.1,
    num_semi_hard: int = 13,
    num_drop_top: int = 3,
    num_classes: int = 21,
) -> jax.Array:
    """Intra-view InfoNCE with semi-hard prototype mining + per-class hard
    pixel sampling (contrast_train.py:283-334), static-shape.

    f: (M, Cf) L2-normalized projections; prototypes: (C, Cf); pseudo_label:
    (M,). The denominator uses the positive prototype plus the semi-hard
    negatives: top-`num_semi_hard` prototype scores minus the top
    `num_drop_top` (the reference's random-10 negatives are computed but
    unused, contrast_train.py:296 — dead code, not replicated).
    """
    m = f.shape[0]
    pos = prototypes[pseudo_label]  # (M, Cf)
    sim = ((f * pos).sum(axis=-1) + 1.0) / 2.0  # (M,)
    a1 = jnp.exp((f * pos).sum(axis=-1) / tau)

    neg_scores = f @ prototypes.T  # (M, C)
    _, top_idx = jax.lax.top_k(neg_scores, num_semi_hard)
    lower_idx = top_idx[:, num_drop_top:]  # (M, 10)
    lower_scores = jnp.take_along_axis(neg_scores, lower_idx, axis=1)
    a2 = jnp.exp((f * pos).sum(axis=-1) / tau) + jnp.exp(lower_scores / tau).sum(axis=-1)

    pixel_loss = -jnp.log(a1 / a2)  # (M,)

    onehot = jax.nn.one_hot(pseudo_label, num_classes, dtype=jnp.float32)  # (M, C)
    n_c = onehot.sum(axis=0)  # (C,)
    half = jnp.floor(n_c / 2.0)
    k60 = jnp.floor(n_c * 0.6)

    big = jnp.float32(3.4e38)

    def class_ranks(values: jax.Array) -> jax.Array:
        """Ascending rank of each pixel within its class, per class column.
        values: (M,) -> (M, C) ranks (non-members get rank >= n_c)."""
        masked = jnp.where(onehot > 0, values[:, None], big)  # (M, C)
        order = jnp.argsort(masked, axis=0)  # (M, C)
        ranks = jnp.zeros_like(masked, dtype=jnp.int32)
        ranks = ranks.at[order, jnp.arange(num_classes)[None, :]].set(
            jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[:, None], (m, num_classes))
        )
        return ranks

    u = jax.random.uniform(rng, (m,))
    rand_ranks = class_ranks(u)  # (M, C)
    sim_ranks = class_ranks(sim)

    sel_rand = (rand_ranks < half[None, :]).astype(jnp.float32) * onehot
    in_band = (sim_ranks >= (k60 - half)[None, :]) & (sim_ranks < k60[None, :])
    sel_band = in_band.astype(jnp.float32) * onehot
    weights = sel_rand + sel_band  # (M, C), values in {0,1,2}

    per_class_sum = (weights * pixel_loss[:, None]).sum(axis=0)  # (C,)
    per_class_cnt = weights.sum(axis=0)
    class_valid = n_c >= 2
    per_class_loss = jnp.where(
        class_valid, per_class_sum / jnp.maximum(per_class_cnt, 1.0), 0.0
    )
    num_present = (n_c >= 1).sum()
    return per_class_loss.sum() / jnp.maximum(num_present, 1).astype(jnp.float32)
