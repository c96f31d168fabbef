"""Stage-3 DeepLab retraining engine.

Rebuild of `segmentation/experiment/*/train.py:38-144`: cross-entropy with
ignore_index 255, SGD momentum 0.9 with the 4 parameter groups (lr x1/x2/x10/
x20, wd on weights only; BN affine not optimized — train.py:71-80 +
deeplabv1.py:53-69), poly lr `(1 - itr/(max_itr+1))^0.9` (train.py:138-144).
BN batch statistics update inside the jitted step (mutable batch_stats) over
the GLOBAL batch — the mesh-wide reduction IS the reference's SyncBN.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SegTrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array, ignore: int = 255) -> jax.Array:
    """mean CE over non-ignored pixels (nn.CrossEntropyLoss(ignore_index=255))."""
    n, h, w, c = logits.shape
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)


def make_seg_train_step(model, tx, with_pred: bool = False):
    """with_pred=True additionally returns `pred`: the argmax mask of the
    LAST batch sample as uint8 (H, W) — the reference's every-100-iters
    TB image of `pred1[-1]` (train.py:112-119) — kept tiny so the host
    fetch at the logging boundary stays cheap on the relay."""

    def train_step(state: SegTrainState, img, seg_label):
        rng, k_d = jax.random.split(state.rng)

        def loss_fn(params):
            out, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, train=True, rngs={"dropout": k_d}, mutable=["batch_stats"],
            )
            return cross_entropy_ignore(out, seg_label), (new_vars["batch_stats"], out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = {"loss": loss}
        if with_pred:
            metrics["pred"] = out[-1].argmax(axis=-1).astype(jnp.uint8)
        return SegTrainState(params, opt_state, new_stats, rng), metrics

    return jax.jit(train_step, donate_argnums=(0,))
