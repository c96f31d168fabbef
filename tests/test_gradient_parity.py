"""Gradient and optimizer-step parity against the LITERAL reference.

Everything in tests/test_reference_oracle.py runs under `torch.no_grad()`;
this module closes the backward half: the same random state_dict in both
frameworks, the same dual-view batch (448/128-style pair at 64/32), the FULL
stage-1 loss assembled on the torch side from live reference-model outputs
(loss math transcribed from `contrast_train.py:126-395` — it lives in the
reference's `__main__`, so transcription is the only option), then

* `total.backward()` vs `jax.grad` — parameter gradients compared for fc8,
  fc_proj, f9, f8_3, f8_4, a b7 conv and a b3 conv. This differentiates the
  custom bit-bisection top-k VJP (`ops/topk.py`), every stop_gradient in
  `train/contrast.py:79-97`, and the PCM/NCE graph against torch autograd
  through the literal reference modules (`resnet38_contrast.py:31-75`,
  backward at `contrast_train.py:397-399`).
* one literal `tool.torchutils.PolyOptimizer` step vs one `poly_sgd` step —
  updated parameters compared, covering the 4-way param grouping
  (`contrast_train.py:91-96`), the positional-momentum quirk
  (`torchutils.py:14`), and the reference's `not_training`/BN freezing
  (`resnet38d.py:192-214`).

Dropout is disabled on both sides (masks cannot be pinned across
frameworks); BN is frozen in train mode anyway, so the differentiated graph
is otherwise exactly the training graph.
"""

import importlib
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_losses_full import torch_losses
from test_reference_oracle import _load_into_jax, _randomize_bn, _rel_err

REFERENCE = "/root/reference"

# gradient comparison targets: (torch param name, flax params path)
GRAD_TARGETS = [
    ("fc8.weight", ("fc8", "kernel")),
    ("fc_proj.weight", ("fc_proj", "kernel")),
    ("f9.weight", ("f9", "kernel")),
    ("f8_3.weight", ("f8_3", "kernel")),
    ("f8_4.weight", ("f8_4", "kernel")),
    ("b7.conv_branch2a.weight", ("backbone", "b7", "conv_branch2a", "kernel")),
    ("b3.conv_branch2a.weight", ("backbone", "b3", "conv_branch2a", "kernel")),
    ("b4_2.conv_branch2b1.weight",
     ("backbone", "b4_2", "conv_branch2b1", "kernel")),
]


@pytest.fixture(scope="module")
def ref_contrast():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU shim
    return importlib.import_module("network.resnet38_contrast")


def _apply_reference_freezing(oracle):
    """The reference's `train()` override side effects (resnet38d.py:192-214)
    minus dropout activation: not_training convs and all BN affine get
    requires_grad=False (so PolyOptimizer's groups exclude them)."""
    for layer in oracle.not_training:
        if isinstance(layer, torch.nn.Conv2d):
            layer.weight.requires_grad = False
        else:
            for c in layer.children():
                c.weight.requires_grad = False
                if c.bias is not None:
                    c.bias.requires_grad = False
    for layer in oracle.modules():
        if isinstance(layer, torch.nn.BatchNorm2d):
            layer.eval()
            layer.weight.requires_grad = False
            layer.bias.requires_grad = False


def _oihw_to_hwio(g):
    return np.transpose(g.detach().numpy(), (2, 3, 1, 0))


def _tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _setup(ref_contrast):
    import jax
    import jax.numpy as jnp

    from wseg_tpu.ops.losses import (
        estimate_prototypes, normalize_cam_for_prototypes,
    )
    from wseg_tpu.ops.resize import resize_bilinear
    from wseg_tpu.train.contrast import contrast_losses

    torch.manual_seed(13)
    oracle = ref_contrast.Net()
    oracle.eval()
    _randomize_bn(oracle)
    _apply_reference_freezing(oracle)

    model, variables = _load_into_jax("contrast", oracle.state_dict())

    n, hi, low = 2, 64, 32
    rng = np.random.RandomState(21)
    img = rng.randn(n, hi, hi, 3).astype(np.float32) * 0.5
    label = np.zeros((n, 21), np.float32)
    label[:, 0] = 1
    label[0, 3] = 1
    label[1, 7] = 1
    label[1, 12] = 1

    # --- torch side: live dual-view forward + transcribed loss assembly ---
    img1_t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    img2_t = F.interpolate(img1_t, (low, low), mode="bilinear", align_corners=True)
    out1_t = oracle(img1_t)
    out2_t = oracle(img2_t)

    # --- jax side ingredients ---
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    m = n * (low // 8) ** 2
    u1 = np.asarray(jax.random.uniform(k1, (m,)))
    u2 = np.asarray(jax.random.uniform(k2, (m,)))

    params, stats = variables["params"], variables["batch_stats"]
    x1 = jnp.asarray(img)
    x2 = resize_bilinear(x1, (low, low), align_corners=True)
    label21_j = jnp.asarray(label)

    def loss_fn(p):
        vs = {"params": p, "batch_stats": stats}
        o1 = model.apply(vs, x1)
        o2 = model.apply(vs, x2)
        mets = contrast_losses(o1, o2, label21_j, (k1, k2), 0.2, low_res=low)
        return mets["loss"], mets

    import jax as _jax
    (loss_j, mets), grads_j = _jax.value_and_grad(loss_fn, has_aux=True)(params)

    # pin the arbitrary bg-prototype tie-break to OUR selection (constants in
    # both graphs — prototypes are detached — so gradients are unaffected by
    # which of the tied bg pixels was picked, but values/denominators must use
    # the same vector)
    ds = low // 8
    o1 = model.apply({"params": params, "batch_stats": stats}, x1)
    o2 = model.apply({"params": params, "batch_stats": stats}, x2)
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

    want = torch_losses(
        out1_t, out2_t, label, u1, u2, low=low,
        pin_protos=(np.asarray(p1), np.asarray(p2)),
    )
    return dict(
        oracle=oracle, model=model, params=params, stats=stats,
        grads_j=grads_j, loss_j=loss_j, mets=mets, want=want,
        pl_j=(np.asarray(pl1), np.asarray(pl2)), out_t=(out1_t, out2_t),
        label=label,
    )


@pytest.fixture(scope="module")
def setup(ref_contrast):
    return _setup(ref_contrast)


@pytest.mark.slow
def test_pseudo_labels_agree(setup):
    """Pre-condition for a meaningful comparison: the per-pixel pseudo-label
    argmax (which drives every sampling path) is identical."""
    import torch.nn.functional as F

    out2_t = setup["out_t"][1]
    # recompute the torch pseudo labels the way torch_losses does
    cam = F.relu(out2_t[3].detach())
    nn_, c1, h1, w1 = cam.shape
    mx = torch.max(cam.view(nn_, c1, -1), dim=-1)[0].view(nn_, c1, 1, 1)
    mn = torch.min(cam.view(nn_, c1, -1), dim=-1)[0].view(nn_, c1, 1, 1)
    cam[cam < mn + 1e-5] = 0
    norm = (cam - mn - 1e-5) / (mx - mn + 1e-5)
    norm[:, 0] = 0.2
    lbl = torch.from_numpy(setup["label"]).view(-1, 21, 1, 1)
    pl_t = F.softmax(norm * lbl, dim=1).argmax(1).reshape(-1).numpy()
    np.testing.assert_array_equal(setup["pl_j"][1], pl_t)


@pytest.mark.slow
def test_loss_values_match_on_live_model_outputs(setup):
    """Same check as test_losses_full but with REAL model outputs from the
    literal reference (not synthetic tensors)."""
    for key in ["loss_cls", "loss_er", "loss_ecr", "loss_cross_nce",
                "loss_cross_nce2", "loss_intra_nce", "loss"]:
        got = float(setup["mets"][key])
        want = float(setup["want"][key])
        np.testing.assert_allclose(got, want, rtol=5e-3, err_msg=key)


@pytest.mark.slow
def test_parameter_gradients_match_literal_reference(setup):
    """The headline check: d loss / d theta agrees for head and backbone
    params through the full dual-view loss."""
    setup["want"]["loss"].backward(retain_graph=True)
    oracle, grads_j = setup["oracle"], setup["grads_j"]
    named = dict(oracle.named_parameters())
    for tname, jpath in GRAD_TARGETS:
        g_t = named[tname].grad
        assert g_t is not None, tname
        want = _oihw_to_hwio(g_t)
        got = np.asarray(_tree_get(grads_j, jpath))
        err = _rel_err(got, want)
        assert err < 1e-2, (tname, err, np.abs(want).max())
        # and the gradient is not trivially zero
        assert np.abs(want).max() > 0, tname


AFF_GRAD_TARGETS = [
    ("f8_3.weight", ("f8_3", "kernel")),
    ("f8_4.weight", ("f8_4", "kernel")),
    ("f8_5.weight", ("f8_5", "kernel")),
    ("f9.weight", ("f9", "kernel")),
    ("b7.conv_branch2a.weight", ("backbone", "b7", "conv_branch2a", "kernel")),
    ("b3.conv_branch2a.weight", ("backbone", "b3", "conv_branch2a", "kernel")),
]


@pytest.mark.slow
def test_affinity_gradients_match_literal_reference():
    """Stage-2 backward parity: the count-normalized bg/fg/neg affinity loss
    (transcribed from `aff_train.py:111-119` — it lives in the reference's
    `__main__`) differentiated through the LITERAL `network/resnet38_aff.py`
    forward vs `jax.grad` through our AffinityNet + `affinity_losses`. This
    covers the ELU taps, the pair-gather graph (`ops/pairs.py` static takes
    vs torch index_select), the exp(-mean|ft-ff|) chain incl. the |.|
    subgradient, and the small-map radius fallback (8x8 map -> radius 3)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from wseg_tpu.train.affinity import affinity_losses

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU shim
    ref_aff = importlib.import_module("network.resnet38_aff")

    torch.manual_seed(29)
    oracle = ref_aff.Net()
    oracle.eval()
    _randomize_bn(oracle)
    _apply_reference_freezing(oracle)

    model, variables = _load_into_jax("affinity", oracle.state_dict())
    params, stats = variables["params"], variables["batch_stats"]

    rng = np.random.RandomState(31)
    x = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.5
    img_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    aff_t = oracle(img_t)
    # disjoint random bg/fg/neg masks of the affinity's (N, D, P) shape —
    # the three labels from AffGtDataset are mutually exclusive
    cls = rng.randint(0, 4, size=tuple(aff_t.shape))
    bg = torch.from_numpy((cls == 0).astype(np.float32))
    fg = torch.from_numpy((cls == 1).astype(np.float32))
    neg = torch.from_numpy((cls == 2).astype(np.float32))

    # transcribed loss assembly (aff_train.py:111-119)
    bg_count = torch.sum(bg) + 1e-5
    fg_count = torch.sum(fg) + 1e-5
    neg_count = torch.sum(neg) + 1e-5
    bg_loss = torch.sum(-bg * torch.log(aff_t + 1e-5)) / bg_count
    fg_loss = torch.sum(-fg * torch.log(aff_t + 1e-5)) / fg_count
    neg_loss = torch.sum(-neg * torch.log(1.0 + 1e-5 - aff_t)) / neg_count
    loss_t = bg_loss / 4 + fg_loss / 4 + neg_loss / 2
    loss_t.backward()

    bg_j, fg_j, neg_j = (jnp.asarray(m.numpy()) for m in (bg, fg, neg))

    def loss_fn(p):
        aff = model.apply({"params": p, "batch_stats": stats}, jnp.asarray(x))
        mets = affinity_losses(aff, bg_j, fg_j, neg_j)
        return mets["loss"], mets

    (loss_j, mets), grads_j = jax.value_and_grad(loss_fn, has_aux=True)(params)

    # shapes + values of the forward agree first
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=2e-3)
    for key, want in [("bg_loss", bg_loss), ("fg_loss", fg_loss),
                      ("neg_loss", neg_loss)]:
        np.testing.assert_allclose(
            float(mets[key]), want.item(), rtol=2e-3, err_msg=key
        )

    named = dict(oracle.named_parameters())
    for tname, jpath in AFF_GRAD_TARGETS:
        g_t = named[tname].grad
        assert g_t is not None, tname
        want = _oihw_to_hwio(g_t)
        got = np.asarray(_tree_get(grads_j, jpath))
        err = _rel_err(got, want)
        assert err < 1e-2, (tname, err, np.abs(want).max())
        assert np.abs(want).max() > 0, tname


@pytest.mark.slow
def test_optimizer_step_matches_literal_reference(setup):
    """One PolyOptimizer step (literal tool/torchutils.py, positional-
    momentum quirk included) vs one poly_sgd step on the SAME gradients: the
    updated parameters must agree, including frozen ones staying put."""
    import jax
    import jax.numpy as jnp
    from tool import torchutils  # literal reference module

    from wseg_tpu.train.optim import label_params, poly_sgd

    oracle = setup["oracle"]
    lr, wd, max_step = 0.01, 5e-4, 100

    pgs = oracle.get_parameter_groups()
    opt = torchutils.PolyOptimizer(
        [
            {"params": pgs[0], "lr": lr, "weight_decay": wd},
            {"params": pgs[1], "lr": 2 * lr, "weight_decay": 0},
            {"params": pgs[2], "lr": 10 * lr, "weight_decay": wd},
            {"params": pgs[3], "lr": 20 * lr, "weight_decay": 0},
        ],
        lr=lr, weight_decay=wd, max_step=max_step,
    )
    # gradients were populated by the backward test (module-scoped setup);
    # make this test self-sufficient if run alone
    if all(p.grad is None for p in pgs[2]):
        setup["want"]["loss"].backward(retain_graph=True)
    opt.step()

    params = setup["params"]
    tx = poly_sgd(lr, wd, max_step=max_step, labels=label_params(params))
    opt_state = tx.init(params)
    updates, _ = tx.update(setup["grads_j"], opt_state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)

    named = dict(oracle.named_parameters())
    targets = GRAD_TARGETS + [
        # frozen: must not move on either side
        ("conv1a.weight", ("backbone", "conv1a", "kernel")),
        ("b2.conv_branch2a.weight",
         ("backbone", "b2", "conv_branch2a", "kernel")),
    ]
    for tname, jpath in targets:
        want = _oihw_to_hwio(named[tname])
        got = np.asarray(_tree_get(new_params, jpath))
        err = _rel_err(got, want)
        assert err < 1e-3, (tname, err)
    # frozen params really did not move on our side
    np.testing.assert_array_equal(
        np.asarray(_tree_get(new_params, ("backbone", "conv1a", "kernel"))),
        np.asarray(_tree_get(params, ("backbone", "conv1a", "kernel"))),
    )
