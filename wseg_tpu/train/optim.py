"""Poly-decay SGD with per-parameter-group lr multipliers and weight decay.

Rebuild of `tool/torchutils.py:11-33` (`PolyOptimizer`) + the 4-way parameter
grouping of `network/resnet38_contrast.py:77-96`:

  group 0: pretrained conv weights      lr x1,  wd
  group 1: pretrained conv biases       lr x2,  wd 0
  group 2: from-scratch conv weights    lr x10, wd
  group 3: from-scratch conv biases     lr x20, wd 0
  frozen:  conv1a / b2* convs and every BN affine (resnet38d.py:192-214)

lr schedule: base_lr * (1 - step/max_step)^0.9 per step (torchutils.py:25-29).

Faithfulness note: the reference constructs `torch.optim.SGD(params, lr,
weight_decay)` POSITIONALLY (torchutils.py:14), which lands `weight_decay`
in SGD's `momentum` slot — so the published results were trained with SGD
momentum = 5e-4 (effectively none) and per-group weight decay from the group
dicts. `momentum` here defaults to that value for parity; set 0.9 for a
"fixed" variant. torch update order is preserved: d = g + wd*p;
buf = momentum*buf + d; p -= lr_group * buf.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class PolySGDState(NamedTuple):
    step: jax.Array
    momentum_buf: Any


# label -> (lr multiplier, uses weight decay)
GROUP_SPECS = {
    "pretrained_w": (1.0, True),
    "pretrained_b": (2.0, False),
    "scratch_w": (10.0, True),
    "scratch_b": (20.0, False),
    "frozen": (0.0, False),
}

# stage-1 heads trained from scratch (resnet38_contrast.py:28, resnet38_aff.py:27)
SCRATCH_MODULES = ("fc8", "fc_proj", "f8_3", "f8_4", "f8_5", "f9")
# modules frozen by the reference's `not_training` list (resnet38_contrast.py:29)
FROZEN_MODULES = ("conv1a", "b2", "b2_1", "b2_2")


def label_params(params: Any) -> Any:
    """Assign each param leaf a group label by its module path."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        mods = path[:-1]
        leafname = path[-1]
        if any(m.startswith("bn") or m.startswith("dropout") for m in mods):
            return "frozen"  # frozen BN affine
        if any(m in FROZEN_MODULES for m in mods):
            return "frozen"
        scratch = any(m in SCRATCH_MODULES for m in mods)
        is_bias = leafname == "bias"
        if scratch:
            return "scratch_b" if is_bias else "scratch_w"
        return "pretrained_b" if is_bias else "pretrained_w"

    return walk(params, ())


def poly_sgd(
    base_lr: float,
    weight_decay: float,
    max_step: int,
    power: float = 0.9,
    momentum: float = 5e-4,
    labels: Any = None,
) -> optax.GradientTransformation:
    """optax transformation implementing the reference PolyOptimizer.

    `labels`: pytree of group-label strings matching the params (built once
    with `label_params`); if None it is derived from params at init.
    """

    def init(params):
        buf = jax.tree.map(jnp.zeros_like, params)
        return PolySGDState(step=jnp.zeros((), jnp.int32), momentum_buf=buf)

    def update(grads, state, params):
        lbls = labels if labels is not None else label_params(params)
        frac = jnp.minimum(state.step, max_step).astype(jnp.float32) / max_step
        lr_t = base_lr * (1.0 - frac) ** power

        def upd(g, p, buf, lbl):
            mult, use_wd = GROUP_SPECS[lbl]
            if mult == 0.0:
                return jnp.zeros_like(p), buf
            d = g + (weight_decay if use_wd else 0.0) * p
            buf = momentum * buf + d
            return -lr_t * mult * buf, buf

        flat_out = jax.tree.map(
            upd, grads, params, state.momentum_buf, lbls,
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        updates = jax.tree.map(lambda t: t[0], flat_out, is_leaf=lambda x: isinstance(x, tuple))
        new_buf = jax.tree.map(lambda t: t[1], flat_out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, PolySGDState(step=state.step + 1, momentum_buf=new_buf)

    return optax.GradientTransformation(init, update)


def current_lr(state: PolySGDState, base_lr: float, max_step: int, power: float = 0.9) -> float:
    frac = min(int(state.step), max_step) / max_step
    return base_lr * (1.0 - frac) ** power


class PolyAdamState(NamedTuple):
    step: jax.Array
    mu: Any
    nu: Any


def poly_adam(
    base_lr: float,
    weight_decay: float,
    max_step: int,
    power: float = 0.9,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    labels: Any = None,
) -> optax.GradientTransformation:
    """Poly-decayed Adam with the same per-group lr/wd multipliers — rebuild
    of `tool/torchutils.py:36-58` (PolyAdam; torch Adam with L2-style
    weight_decay added to the gradient)."""

    b1, b2 = betas

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return PolyAdamState(step=jnp.zeros((), jnp.int32), mu=z,
                             nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        lbls = labels if labels is not None else label_params(params)
        frac = jnp.minimum(state.step, max_step).astype(jnp.float32) / max_step
        lr_t = base_lr * (1.0 - frac) ** power
        t = state.step + 1

        def upd(g, p, mu, nu, lbl):
            mult, use_wd = GROUP_SPECS[lbl]
            if mult == 0.0:
                return jnp.zeros_like(p), mu, nu
            d = g + (weight_decay if use_wd else 0.0) * p
            mu = b1 * mu + (1 - b1) * d
            nu = b2 * nu + (1 - b2) * jnp.square(d)
            mu_hat = mu / (1 - b1 ** t.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** t.astype(jnp.float32))
            return -lr_t * mult * mu_hat / (jnp.sqrt(nu_hat) + eps), mu, nu

        out = jax.tree.map(upd, grads, params, state.mu, state.nu, lbls,
                           is_leaf=lambda x: isinstance(x, jax.Array))
        is_t = lambda x: isinstance(x, tuple)
        updates = jax.tree.map(lambda o: o[0], out, is_leaf=is_t)
        mu = jax.tree.map(lambda o: o[1], out, is_leaf=is_t)
        nu = jax.tree.map(lambda o: o[2], out, is_leaf=is_t)
        return updates, PolyAdamState(step=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
