"""Multi-step training-TRAJECTORY parity against the literal reference.

tests/test_gradient_parity.py proves one backward + one optimizer step equal;
this module closes the remaining evidence tier: drift that COMPOUNDS over
consecutive optimizer steps (discrete tie-breaks in top-k selection, eps
placements, resize boundary handling) is invisible to single-step parity but
is exactly what separates "one matching step" from "the same training run".

Protocol (VERDICT r3 item 1): the same converted state_dict on both sides,
the SAME fixed batch every step (pure compounding — no data noise), dropout
off, the intra-view NCE sampling pinned through the shared uniform-key
convention of tests/test_losses_full.py, the prototype matrices pinned to our
side's values each step (they are detached constants in both graphs; the bg
prototype's top-k is an arbitrary tie-break over a CONSTANT channel, so
pinning removes the one genuinely framework-arbitrary ingredient and nothing
else). Then:

* stage 1: 20 consecutive full dual-view steps, torch `loss.backward()` +
  literal `tool.torchutils.PolyOptimizer` vs `jax.grad` + `poly_sgd`
  (contrast_train.py:126-441 loop structure).
* stage 2: 12 consecutive AffinityNet steps (aff_train.py:101-146).
* bf16: the shipped mixed-precision train step run for 12 steps against the
  f32 step from identical state — extending the one-step closeness test in
  tests/test_train_step.py to a trajectory bound.

Divergence envelopes (stated, justified). Two regimes exist, measured on
this box before the bounds were set:

* At the reference lr (0.01) the trajectory map is CHAOTIC in its discrete
  selections: by step ~13 the two sides' accumulated ~1e-4 relative param
  difference crosses a pseudo-label argmax tie on the 4x4 view-2 map, the
  sampling paths split, and the loss diff jumps from 1.4e-4 to 0.21 — the
  same sensitivity the reference run has to ANY 1e-6 perturbation of its own
  weights. That is self-sensitivity, not implementation drift, and no
  cross-framework bound survives it.
* At lr=0.002 (same optimizer, same graph — the small-step regime where the
  map is contractive) the trajectories track at 1e-4..2e-4 relative for 24
  steps; twice a SINGLE pixel's pseudo-label flips for one step (agreement
  0.938) and RE-CONVERGES the next step (measured max transient loss diff
  9.3e-3, final loss diff 6.5e-3). The envelope is therefore asserted in
  this regime: it bounds exactly the compounding NUMERICAL drift (resize
  boundaries, eps placements, top-k VJP routing) that single-step parity
  cannot see, while tolerating the measured transient tie flips.

Bounds (~3x above measured): per-step loss rel diff < 3e-2, pseudo-label
agreement >= 0.9 every step / fully re-converged in >=80% of steps, final
params within 3e-2 relative on all gradient-target tensors. Stage 2 has no
sampling and holds a far tighter envelope (measured loss diff <=1e-4).
"""

import importlib
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_gradient_parity import (
    GRAD_TARGETS,
    _apply_reference_freezing,
    _oihw_to_hwio,
    _tree_get,
)
from test_losses_full import torch_losses
from test_reference_oracle import _load_into_jax, _randomize_bn, _rel_err

REFERENCE = "/root/reference"


def _ref_module(name):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU shim
    return importlib.import_module(name)


def _make_poly_optimizer(oracle, lr, wd, max_step):
    """The literal reference PolyOptimizer over the reference's 4 groups
    (contrast_train.py:91-96)."""
    torchutils = _ref_module("tool.torchutils")
    pgs = oracle.get_parameter_groups()
    return torchutils.PolyOptimizer(
        [
            {"params": pgs[0], "lr": lr, "weight_decay": wd},
            {"params": pgs[1], "lr": 2 * lr, "weight_decay": 0},
            {"params": pgs[2], "lr": 10 * lr, "weight_decay": wd},
            {"params": pgs[3], "lr": 20 * lr, "weight_decay": 0},
        ],
        lr=lr, weight_decay=wd, max_step=max_step,
    )


@pytest.mark.slow
def test_stage1_trajectory_parity():
    """20 consecutive stage-1 train steps: loss trajectory, per-step pseudo-
    label agreement, and final parameters vs the literal reference."""
    import jax
    import jax.numpy as jnp

    from wseg_tpu.ops.losses import (
        estimate_prototypes, normalize_cam_for_prototypes,
    )
    from wseg_tpu.ops.resize import resize_bilinear
    from wseg_tpu.train.contrast import contrast_losses
    from wseg_tpu.train.optim import label_params, poly_sgd

    ref_contrast = _ref_module("network.resnet38_contrast")

    torch.manual_seed(13)
    oracle = ref_contrast.Net()
    oracle.eval()
    _randomize_bn(oracle)
    _apply_reference_freezing(oracle)
    model, variables = _load_into_jax("contrast", oracle.state_dict())
    params, stats = variables["params"], variables["batch_stats"]

    n, hi, low = 2, 64, 32
    # lr 0.002: the contractive regime — see the module docstring for why
    # the reference lr is chaotically self-sensitive and unboundable
    steps, lr, wd, max_step = 24, 0.002, 5e-4, 100
    rng = np.random.RandomState(21)
    img = rng.randn(n, hi, hi, 3).astype(np.float32) * 0.5
    label = np.zeros((n, 21), np.float32)
    label[:, 0] = 1
    label[0, 3] = 1
    label[1, 7] = 1
    label[1, 12] = 1

    img1_t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    img2_t = F.interpolate(img1_t, (low, low), mode="bilinear", align_corners=True)
    opt = _make_poly_optimizer(oracle, lr, wd, max_step)

    x1 = jnp.asarray(img)
    x2 = resize_bilinear(x1, (low, low), align_corners=True)
    label21_j = jnp.asarray(label)
    ds = low // 8
    m = n * ds * ds
    tx = poly_sgd(lr, wd, max_step=max_step, labels=label_params(params))
    opt_state = tx.init(params)

    @jax.jit
    def grad_fn(p, k1, k2):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": stats}
            o1 = model.apply(vs, x1)
            o2 = model.apply(vs, x2)
            mets = contrast_losses(o1, o2, label21_j, (k1, k2), 0.2, low_res=low)
            return mets["loss"], mets

        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    @jax.jit
    def proto_fn(p):
        """Current-step prototype matrices + pseudo labels (the pinning
        constants — see module docstring)."""
        vs = {"params": p, "batch_stats": stats}
        o1 = model.apply(vs, x1)
        o2 = model.apply(vs, x2)
        f1r = resize_bilinear(o1[2], (ds, ds), align_corners=True)
        c1r = resize_bilinear(o1[3], (ds, ds), align_corners=True)
        p1, pl1 = estimate_prototypes(
            f1r, normalize_cam_for_prototypes(jax.lax.stop_gradient(c1r), 0.2),
            label21_j,
        )
        p2, pl2 = estimate_prototypes(
            o2[2], normalize_cam_for_prototypes(jax.lax.stop_gradient(o2[3]), 0.2),
            label21_j,
        )
        return p1, pl1, p2, pl2

    loss_diffs, pl_agreements = [], []
    base = jax.random.PRNGKey(4)
    for t in range(steps):
        k1, k2 = jax.random.split(jax.random.fold_in(base, t))
        u1 = np.asarray(jax.random.uniform(k1, (m,)))
        u2 = np.asarray(jax.random.uniform(k2, (m,)))

        (loss_j, mets), grads = grad_fn(params, k1, k2)
        p1, pl1, p2, pl2 = proto_fn(params)

        opt.zero_grad()
        out1_t = oracle(img1_t)
        out2_t = oracle(img2_t)
        want = torch_losses(
            out1_t, out2_t, label, u1, u2, low=low,
            pin_protos=(np.asarray(p1), np.asarray(p2)),
        )
        want["loss"].backward()
        opt.step()

        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        lt, lj = float(want["loss"]), float(loss_j)
        loss_diffs.append(abs(lj - lt) / (abs(lt) + 1e-8))

        # pseudo-label agreement on the 2nd view (drives every sampling path)
        cam = F.relu(out2_t[3].detach())
        nn_, c1, h1, w1 = cam.shape
        mx = torch.max(cam.view(nn_, c1, -1), dim=-1)[0].view(nn_, c1, 1, 1)
        mn = torch.min(cam.view(nn_, c1, -1), dim=-1)[0].view(nn_, c1, 1, 1)
        cam[cam < mn + 1e-5] = 0
        norm = (cam - mn - 1e-5) / (mx - mn + 1e-5)
        norm[:, 0] = 0.2
        lbl_t = torch.from_numpy(label).view(-1, 21, 1, 1)
        pl_t = F.softmax(norm * lbl_t, dim=1).argmax(1).reshape(-1).numpy()
        pl_agreements.append(float((np.asarray(pl2) == pl_t).mean()))

    # --- the envelope (calibrated ~3x above measured; see module docstring)
    assert max(loss_diffs) < 3e-2, (max(loss_diffs), loss_diffs)
    assert min(pl_agreements) >= 0.9, pl_agreements
    full_agree = sum(1 for a in pl_agreements if a == 1.0) / steps
    assert full_agree >= 0.8, pl_agreements

    named = dict(oracle.named_parameters())
    for tname, jpath in GRAD_TARGETS:
        want_p = _oihw_to_hwio(named[tname])
        got_p = np.asarray(_tree_get(params, jpath))
        err = _rel_err(got_p, want_p)
        assert err < 3e-2, (tname, err)
    # and the trajectory actually went somewhere (the test is not vacuous)
    moved = _rel_err(
        np.asarray(_tree_get(params, ("fc8", "kernel"))),
        np.asarray(_tree_get(variables["params"], ("fc8", "kernel"))),
    )
    assert moved > 1e-3, moved


@pytest.mark.slow
def test_stage2_affinity_trajectory_parity():
    """12 consecutive AffinityNet train steps vs the literal reference
    (aff_train.py:101-146): loss trajectory + final parameters."""
    import jax
    import jax.numpy as jnp

    from wseg_tpu.train.affinity import affinity_losses
    from wseg_tpu.train.optim import label_params, poly_sgd

    ref_aff = _ref_module("network.resnet38_aff")

    torch.manual_seed(29)
    oracle = ref_aff.Net()
    oracle.eval()
    _randomize_bn(oracle)
    _apply_reference_freezing(oracle)
    model, variables = _load_into_jax("affinity", oracle.state_dict())
    params, stats = variables["params"], variables["batch_stats"]

    steps, lr, wd, max_step = 12, 0.1, 1e-4, 100
    rng = np.random.RandomState(31)
    x = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.5
    img_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    with torch.no_grad():
        aff_shape = tuple(oracle(img_t).shape)
    cls = rng.randint(0, 4, size=aff_shape)
    bg_t = torch.from_numpy((cls == 0).astype(np.float32))
    fg_t = torch.from_numpy((cls == 1).astype(np.float32))
    neg_t = torch.from_numpy((cls == 2).astype(np.float32))
    bg_j, fg_j, neg_j = (jnp.asarray(m.numpy()) for m in (bg_t, fg_t, neg_t))

    opt = _make_poly_optimizer(oracle, lr, wd, max_step)
    tx = poly_sgd(lr, wd, max_step=max_step, labels=label_params(params))
    opt_state = tx.init(params)
    x_j = jnp.asarray(x)

    @jax.jit
    def grad_fn(p):
        def loss_fn(p):
            aff = model.apply({"params": p, "batch_stats": stats}, x_j)
            mets = affinity_losses(aff, bg_j, fg_j, neg_j)
            return mets["loss"], mets

        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    loss_diffs = []
    for t in range(steps):
        (loss_j, _), grads = grad_fn(params)

        opt.zero_grad()
        aff_t = oracle(img_t)
        bg_count = torch.sum(bg_t) + 1e-5
        fg_count = torch.sum(fg_t) + 1e-5
        neg_count = torch.sum(neg_t) + 1e-5
        loss_t = (
            torch.sum(-bg_t * torch.log(aff_t + 1e-5)) / bg_count / 4
            + torch.sum(-fg_t * torch.log(aff_t + 1e-5)) / fg_count / 4
            + torch.sum(-neg_t * torch.log(1.0 + 1e-5 - aff_t)) / neg_count / 2
        )
        loss_t.backward()
        opt.step()

        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        loss_diffs.append(
            abs(float(loss_j) - loss_t.item()) / (abs(loss_t.item()) + 1e-8)
        )

    assert max(loss_diffs) < 1e-2, (max(loss_diffs), loss_diffs)

    named = dict(oracle.named_parameters())
    targets = [
        ("f8_3.weight", ("f8_3", "kernel")),
        ("f8_5.weight", ("f8_5", "kernel")),
        ("f9.weight", ("f9", "kernel")),
        ("b7.conv_branch2a.weight", ("backbone", "b7", "conv_branch2a", "kernel")),
        ("b3.conv_branch2a.weight", ("backbone", "b3", "conv_branch2a", "kernel")),
    ]
    for tname, jpath in targets:
        err = _rel_err(
            np.asarray(_tree_get(params, jpath)), _oihw_to_hwio(named[tname])
        )
        assert err < 1e-2, (tname, err)
    moved = _rel_err(
        np.asarray(_tree_get(params, ("f9", "kernel"))),
        np.asarray(_tree_get(variables["params"], ("f9", "kernel"))),
    )
    assert moved > 1e-3, moved


@pytest.mark.slow
def test_bf16_trajectory_bounded_vs_f32():
    """The shipped mixed-precision step (make_train_step(compute_dtype=
    bf16)) run for 12 steps from identical state vs the f32 step: the loss
    trajectories must track within the bf16 resolution envelope and the
    final parameters stay close in relative terms — extending
    tests/test_train_step.py's one-step closeness to a trajectory bound.

    Envelope: bf16 has ~3 decimal digits (eps ~ 7.8e-3); per-step loss
    differences sit at O(bf16 eps) and parameter drift accumulates roughly
    linearly in steps x lr. Measured on this box: max per-step loss rel diff
    ~2e-2, final fc8 rel err ~3e-2 over 12 steps; bounds set ~3x above."""
    import jax
    import jax.numpy as jnp

    from wseg_tpu.models import build_model
    from wseg_tpu.train.contrast import TrainState, make_train_step
    from wseg_tpu.train.optim import label_params, poly_sgd

    import optax

    model = build_model("contrast")
    n, hi, low = 2, 64, 32
    steps, lr, wd = 12, 0.005, 5e-4
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(n, hi, hi, 3).astype(np.float32) * 0.5)
    label = np.zeros((n, 20), np.float32)
    label[0, 2] = 1
    label[1, 6] = 1
    label_j = jnp.asarray(label)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hi, hi, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    # random init diverges at reference hyperparameters (they assume
    # ImageNet weights) — use the CLI's from-scratch recipe: global-norm
    # clipping, like `contrast_train --grad_clip 5.0`
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        poly_sgd(lr, wd, max_step=100, labels=label_params(params)),
    )

    def run(compute_dtype):
        step = make_train_step(model, tx, low_res=low, compute_dtype=compute_dtype)
        # fresh device copies: the jitted step donates its input state, which
        # would otherwise delete the shared init arrays after the first run
        p0 = jax.tree.map(jnp.array, params)
        s0 = jax.tree.map(jnp.array, stats)
        state = TrainState(p0, tx.init(p0), s0, jax.random.PRNGKey(3))
        losses = []
        for _ in range(steps):
            state, mets = step(state, img, label_j)
            losses.append(float(mets["loss"]))
        return losses, state.params

    losses_f32, params_f32 = run(None)
    losses_bf16, params_bf16 = run(jnp.bfloat16)

    rel = [
        abs(a - b) / (abs(a) + 1e-8) for a, b in zip(losses_f32, losses_bf16)
    ]
    assert max(rel) < 6e-2, (max(rel), losses_f32, losses_bf16)

    for path in [("fc8", "kernel"), ("fc_proj", "kernel"), ("f9", "kernel")]:
        err = _rel_err(
            np.asarray(_tree_get(params_bf16, path)),
            np.asarray(_tree_get(params_f32, path)),
        )
        assert err < 1e-1, (path, err)
    # both trajectories are live (losses change over the run)
    assert abs(losses_f32[0] - losses_f32[-1]) > 1e-3
