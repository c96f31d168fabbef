"""AffinityNet training step (stage 2).

Rebuild of the `aff_train.py:101-123` loop: count-normalized cross-entropy on
the predicted pairwise affinities against the (bg_pos, fg_pos, neg) targets,
loss = bg/4 + fg/4 + neg/2 (aff_train.py:115-119). One jitted step; gradient
all-reduce over the mesh comes from GSPMD like stage 1.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AffTrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array


def affinity_losses(aff: jax.Array, bg_label, fg_label, neg_label):
    """aff: (N, D, P) predicted affinities; labels same shape."""
    bg_count = bg_label.sum() + 1e-5
    fg_count = fg_label.sum() + 1e-5
    neg_count = neg_label.sum() + 1e-5
    bg_loss = (-bg_label * jnp.log(aff + 1e-5)).sum() / bg_count
    fg_loss = (-fg_label * jnp.log(aff + 1e-5)).sum() / fg_count
    neg_loss = (-neg_label * jnp.log(1.0 + 1e-5 - aff)).sum() / neg_count
    loss = bg_loss / 4 + fg_loss / 4 + neg_loss / 2
    return {
        "loss": loss, "bg_loss": bg_loss, "fg_loss": fg_loss, "neg_loss": neg_loss,
        "bg_cnt": bg_count, "fg_cnt": fg_count, "neg_cnt": neg_count,
    }


def make_aff_train_step(model, tx):
    def train_step(state: AffTrainState, img, bg_label, fg_label, neg_label):
        rng, k_d = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            aff = model.apply(variables, img, train=True, rngs={"dropout": k_d})
            metrics = affinity_losses(aff, bg_label, fg_label, neg_label)
            return metrics["loss"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return AffTrainState(params, opt_state, state.batch_stats, rng), metrics

    return jax.jit(train_step, donate_argnums=(0,))
