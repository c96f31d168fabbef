"""Stage-3 parity against the LITERAL reference segmentation modules
(/root/reference/segmentation/lib) — the strongest available oracle for the
DeepLab path: the reference's own `net.deeplabv1` (with its `resnet38`
backbone, `backbone/resnet38d.py`) runs on CPU torch, the same random
state_dict loaded into our Flax DeepLabV1 through a name-mapped conversion.

Companion to tests/test_reference_oracle.py (stage-1 nets).
"""

import importlib
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import torch

SEG_LIB = "/root/reference/segmentation/lib"


@pytest.fixture(scope="module")
def ref_seg():
    """Import the reference seg lib. NB `/root/reference` (stage-1 oracle)
    also contains top-level `utils`/`network` packages — the seg lib's
    `utils` must win, so it is inserted at position 0 and any previously
    imported `utils`/`net` modules are evicted."""
    for mod in list(sys.modules):
        if mod == "utils" or mod.startswith("utils.") or mod == "net" or mod.startswith("net."):
            sys.modules.pop(mod)
    if SEG_LIB in sys.path:
        sys.path.remove(SEG_LIB)
    sys.path.insert(0, SEG_LIB)
    return importlib.import_module("net.deeplabv1")


def _randomize_bn(model: torch.nn.Module):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def _convert_seg_state_dict(sd: dict):
    """Reference deeplabv1 state_dict -> (params, batch_stats) for our
    DeepLabV1 (seg/deeplab.py). Backbone keys reuse the stage-1 name rules
    (the seg lib's resnet38d duplicates the stage-1 module's naming) nested
    under backbone/resnet38; head keys map directly."""
    from wseg_tpu.utils.checkpoint import _assign, _torch_key_to_flax

    heads = {"conv_fov", "conv_fov2", "cls_conv"}
    bns = {"bn_fov", "bn_fov2"}
    params: dict = {}
    stats: dict = {}
    for key, val in sd.items():
        toks = key.split(".")
        if toks[-1] == "num_batches_tracked":
            continue
        arr = val.detach().numpy().copy()
        if toks[0] == "backbone":
            mapped = _torch_key_to_flax(".".join(toks[1:]))
            if mapped is None:
                continue
            path, kind = mapped
            path = ["backbone", "resnet38"] + path[1:]
            if kind == "conv":
                _assign(params, path, arr.transpose(2, 3, 1, 0))
            elif kind in ("bn_scale", "bn_bias"):
                _assign(params, path, arr)
            else:
                _assign(stats, path, arr.astype(np.float32))
        elif toks[0] in heads:
            leaf = "kernel" if toks[1] == "weight" else "bias"
            if leaf == "kernel":
                arr = arr.transpose(2, 3, 1, 0)
            _assign(params, [toks[0], leaf], arr)
        elif toks[0] in bns:
            if toks[1] in ("weight", "bias"):
                _assign(params, [toks[0], {"weight": "scale", "bias": "bias"}[toks[1]]], arr)
            else:
                _assign(stats, [toks[0], {"running_mean": "mean", "running_var": "var"}[toks[1]]],
                        arr.astype(np.float32))
        else:
            raise KeyError(key)
    return params, stats


@pytest.mark.slow
def test_deeplabv1_resnet38_matches_reference(ref_seg):
    import jax
    import jax.numpy as jnp

    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net

    torch.manual_seed(0)
    cfg_t = SimpleNamespace(
        MODEL_BACKBONE="resnet38", MODEL_BACKBONE_PRETRAIN=False,
        TRAIN_BN_MOM=3e-4, MODEL_NUM_CLASSES=21,
    )
    tmodel = ref_seg.deeplabv1(cfg_t)
    _randomize_bn(tmodel)
    tmodel.eval()

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()  # (1, 21, 64, 96)

    model = generate_net(EXPERIMENTS["SEAM_deeplabv1_resnet38"])
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 96, 3), jnp.float32)
    )
    params, stats = _convert_seg_state_dict(tmodel.state_dict())

    from wseg_tpu.utils.checkpoint import merge_params

    variables = {
        "params": merge_params(variables["params"], params),
        "batch_stats": merge_params(variables["batch_stats"], stats),
    }
    got = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    ).transpose(0, 3, 1, 2)

    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
    assert rel < 5e-3, rel
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))


@pytest.mark.slow
def test_deeplabv1_caffe_matches_reference(ref_seg):
    """The registered-but-unused `deeplabv1_caffe` variant (deeplabv1.py:72-
    130): maxpool head, 4096-wide biased convs without BN, double dropout.
    Same literal-reference oracle recipe as the deeplabv1 test; also asserts
    the variant's param grouping (from_scratch_layers = [cls_conv] only,
    deeplabv1.py:88) through seg_param_labels(scratch_mods=FROM_SCRATCH)."""
    import jax
    import jax.numpy as jnp

    from wseg_tpu.seg.config import SegConfig
    from wseg_tpu.seg.deeplab import DeepLabV1Caffe, generate_net, seg_param_labels
    from wseg_tpu.utils.checkpoint import merge_params

    builder = importlib.import_module("net.backbone.builder")
    orig = builder.build_backbone
    # the caffe ctor calls build_backbone(name, os=...) whose default
    # pretrained=True would dereference the missing mxnet weight path
    ref_seg.build_backbone = lambda name, **kw: orig(name, pretrained=False)
    try:
        torch.manual_seed(3)
        cfg_t = SimpleNamespace(
            MODEL_BACKBONE="resnet38", MODEL_OUTPUT_STRIDE=8,
            MODEL_NUM_CLASSES=21,
        )
        tmodel = ref_seg.deeplabv1_caffe(cfg_t)
    finally:
        ref_seg.build_backbone = orig
    _randomize_bn(tmodel)
    tmodel.eval()

    rng = np.random.RandomState(4)
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    cfg = SegConfig(MODEL_NAME="deeplabv1_caffe", MODEL_BACKBONE="resnet38")
    model = generate_net(cfg)
    assert isinstance(model, DeepLabV1Caffe)
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 96, 3), jnp.float32)
    )
    params, stats = _convert_seg_state_dict(tmodel.state_dict())
    variables = {
        "params": merge_params(variables["params"], params),
        "batch_stats": merge_params(variables["batch_stats"], stats),
    }
    got = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    ).transpose(0, 3, 1, 2)

    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
    assert rel < 5e-3, rel
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))

    # param grouping: conv_fov/conv_fov2 are PRETRAINED for this variant
    labels = seg_param_labels(variables["params"], scratch_mods=model.FROM_SCRATCH)
    assert labels["conv_fov"] == {"kernel": "pretrained_w", "bias": "pretrained_b"}
    assert labels["conv_fov2"] == {"kernel": "pretrained_w", "bias": "pretrained_b"}
    assert labels["cls_conv"] == {"kernel": "scratch_w", "bias": "scratch_b"}
    # ...unlike deeplabv1, whose head convs are all scratch (deeplabv1.py:28)
    assert seg_param_labels(variables["params"])["conv_fov"]["kernel"] == "scratch_w"


def _convert_dilated_resnet_sd(sd: dict):
    """Reference deeplabv2 (dilated torch ResNet backbone + ASPP) state_dict
    -> (params, batch_stats) for our DeepLabV2. Name map: Sequential deep_base
    stem conv1.{0,1,3,4,6} -> conv1_0/conv1_bn0/conv1_1/conv1_bn1/conv1_2;
    layerX.i.* -> layerX_i.*; downsample.{0,1} -> downsample_{conv,bn};
    ASPP branchN.{0,1} / conv_cat.{0,1} -> branchN/conv_cat {conv,bn}."""
    from wseg_tpu.utils.checkpoint import _assign

    stem = {"0": "conv1_0", "1": "conv1_bn0", "3": "conv1_1",
            "4": "conv1_bn1", "6": "conv1_2"}
    params: dict = {}
    stats: dict = {}

    def put(path_mods, is_bn, leaf, arr):
        if not is_bn:
            leafn = "kernel" if leaf == "weight" else "bias"
            if leafn == "kernel":
                arr = arr.transpose(2, 3, 1, 0)
            _assign(params, path_mods + [leafn], arr)
        elif leaf in ("weight", "bias"):
            _assign(params, path_mods + [{"weight": "scale", "bias": "bias"}[leaf]], arr)
        else:
            _assign(stats, path_mods + [{"running_mean": "mean", "running_var": "var"}[leaf]],
                    arr.astype(np.float32))

    for key, val in sd.items():
        toks = key.split(".")
        if toks[-1] == "num_batches_tracked":
            continue
        arr = val.detach().numpy().copy()
        leaf = toks[-1]
        if toks[0] == "backbone":
            mods = toks[1:-1]
            if mods[0] == "conv1":
                name = stem[mods[1]]
                put(["backbone", name], "bn" in name, leaf, arr)
            elif mods[0] == "bn1":
                put(["backbone", "bn1"], True, leaf, arr)
            else:  # layerX.i.(conv/bn/downsample...)
                blk = f"{mods[0]}_{mods[1]}"
                if mods[2] == "downsample":
                    name = {"0": "downsample_conv", "1": "downsample_bn"}[mods[3]]
                    put(["backbone", blk, name], name.endswith("bn"), leaf, arr)
                else:
                    put(["backbone", blk, mods[2]], mods[2].startswith("bn"), leaf, arr)
        elif toks[0] == "aspp":
            mods = toks[1:-1]
            if mods[0] in ("branch5_conv", "branch5_bn"):
                put(["aspp", mods[0]], mods[0] == "branch5_bn", leaf, arr)
            else:  # branchN.{0,1} / conv_cat.{0,1} sequentials
                name = {"0": "conv", "1": "bn"}[mods[1]]
                put(["aspp", mods[0], name], name == "bn", leaf, arr)
        elif toks[0] == "cls_conv":
            put(["cls_conv"], False, leaf, arr)
        else:
            raise KeyError(key)
    return params, stats


@pytest.mark.slow
def test_deeplabv2_resnet50_matches_reference(ref_seg):
    """EPS-path family oracle: the reference's net.deeplabv2 with its dilated
    torch ResNet (Bottleneck) backbone + ASPP-with-global vs our DeepLabV2.
    resnet50 stands in for the resnet101 preset (same block type, 3x faster)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from wseg_tpu.seg.config import SegConfig
    from wseg_tpu.seg.deeplab import generate_net
    from wseg_tpu.utils.checkpoint import merge_params

    dl2 = importlib.import_module("net.deeplabv2")
    builder = importlib.import_module("net.backbone.builder")
    # the reference hardcodes pretrained=True (a local .pth path that does
    # not exist here); route through the factory with pretrained off
    orig = builder.build_backbone
    dl2.build_backbone = lambda name, **kw: orig(name, pretrained=False)
    try:
        torch.manual_seed(0)
        cfg_t = SimpleNamespace(
            MODEL_BACKBONE="resnet50", MODEL_ASPP_OUTDIM=256,
            MODEL_ASPP_HASGLOBAL=True, MODEL_NUM_CLASSES=21,
            TRAIN_BN_MOM=3e-4, MODEL_OUTPUT_STRIDE=8,
        )
        tmodel = dl2.deeplabv2(cfg_t)
    finally:
        dl2.build_backbone = orig
    _randomize_bn(tmodel)
    tmodel.eval()

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    cfg = SegConfig(
        MODEL_NAME="deeplabv2", MODEL_BACKBONE="resnet50",
        MODEL_ASPP_OUTDIM=256, MODEL_ASPP_HASGLOBAL=True,
    )
    model = generate_net(cfg)
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 96, 3), jnp.float32)
    )
    params, stats = _convert_dilated_resnet_sd(tmodel.state_dict())
    variables = {
        "params": merge_params(variables["params"], params),
        "batch_stats": merge_params(variables["batch_stats"], stats),
    }
    got = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    ).transpose(0, 3, 1, 2)

    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
    assert rel < 5e-3, rel
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))


@pytest.mark.slow
def test_deeplabv1_gradients_match_reference(ref_seg):
    """Stage-3 backward parity: CrossEntropyLoss(ignore_index=255) — the
    reference's whole training criterion (experiment/*/train.py:85,97) —
    differentiated through the literal `net.deeplabv1` vs `jax.grad` through
    our DeepLabV1 + `cross_entropy_ignore`. BN eval on both sides (the
    reference freezes BN affine during retraining anyway, train.py:71-80);
    covers the head chain (conv_fov -> conv_fov2 -> cls_conv + upsample) and
    the backbone backward, including the ignore-pixel masking and the
    mean-over-valid normalization."""
    import jax
    import jax.numpy as jnp

    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net
    from wseg_tpu.train.seg import cross_entropy_ignore
    from wseg_tpu.utils.checkpoint import merge_params

    torch.manual_seed(5)
    cfg_t = SimpleNamespace(
        MODEL_BACKBONE="resnet38", MODEL_BACKBONE_PRETRAIN=False,
        TRAIN_BN_MOM=3e-4, MODEL_NUM_CLASSES=21,
    )
    tmodel = ref_seg.deeplabv1(cfg_t)
    _randomize_bn(tmodel)
    tmodel.eval()

    rng = np.random.RandomState(9)
    x = rng.rand(2, 3, 64, 96).astype(np.float32)
    label = rng.randint(0, 21, size=(2, 64, 96)).astype(np.int64)
    label[rng.rand(2, 64, 96) < 0.3] = 255  # exercise the ignore mask

    pred_t = tmodel(torch.from_numpy(x))
    loss_t = torch.nn.CrossEntropyLoss(ignore_index=255)(
        pred_t, torch.from_numpy(label)
    )
    loss_t.backward()

    model = generate_net(EXPERIMENTS["SEAM_deeplabv1_resnet38"])
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 96, 3), jnp.float32)
    )
    params_c, stats_c = _convert_seg_state_dict(tmodel.state_dict())
    params = merge_params(variables["params"], params_c)
    stats = merge_params(variables["batch_stats"], stats_c)

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    lj = jnp.asarray(label.astype(np.int32))

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats}, xj)
        return cross_entropy_ignore(out, lj)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=2e-3)

    named = dict(tmodel.named_parameters())
    targets = [
        ("cls_conv.weight", ("cls_conv", "kernel")),
        ("conv_fov.weight", ("conv_fov", "kernel")),
        ("conv_fov2.weight", ("conv_fov2", "kernel")),
        ("backbone.b7.conv_branch2a.weight",
         ("backbone", "resnet38", "b7", "conv_branch2a", "kernel")),
        ("backbone.b3.conv_branch2a.weight",
         ("backbone", "resnet38", "b3", "conv_branch2a", "kernel")),
    ]
    for tname, jpath in targets:
        g_t = named[tname].grad
        assert g_t is not None, tname
        want = g_t.detach().numpy().transpose(2, 3, 1, 0)
        got = grads
        for kk in jpath:
            got = got[kk]
        got = np.asarray(got)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        assert err < 1e-2, (tname, err, np.abs(want).max())
        assert np.abs(want).max() > 0, tname


@pytest.mark.slow
def test_seg_optimizer_steps_match_reference(ref_seg):
    """Stage-3 optimizer parity: 3 steps of the reference's torch.optim.SGD
    (momentum 0.9, 4 parameter groups from deeplabv1.get_parameter_groups,
    poly adjust_lr with (1 - itr/(max_itr+1))^power, train.py:71-80,138-144)
    vs 3 `poly_sgd` steps with `seg_param_labels` grouping on the SAME
    per-step gradients. Multi-step catches the momentum-buffer x poly-lr
    interaction a single-step check misses; BN affine must not move (the
    reference never collects it into a group)."""
    import jax
    import jax.numpy as jnp
    import torch.optim as optim

    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net, seg_param_labels
    from wseg_tpu.train.optim import poly_sgd
    from wseg_tpu.utils.checkpoint import merge_params

    torch.manual_seed(17)
    cfg_t = SimpleNamespace(
        MODEL_BACKBONE="resnet38", MODEL_BACKBONE_PRETRAIN=False,
        TRAIN_BN_MOM=3e-4, MODEL_NUM_CLASSES=21,
    )
    tmodel = ref_seg.deeplabv1(cfg_t)
    _randomize_bn(tmodel)
    tmodel.eval()

    lr0, wd, power, max_itr = 0.001, 5e-4, 0.9, 10

    pgs = tmodel.get_parameter_groups()
    opt = optim.SGD(
        params=[
            {"params": pgs[0], "lr": lr0, "weight_decay": wd},
            {"params": pgs[1], "lr": 2 * lr0, "weight_decay": 0},
            {"params": pgs[2], "lr": 10 * lr0, "weight_decay": wd},
            {"params": pgs[3], "lr": 20 * lr0, "weight_decay": 0},
        ],
        momentum=0.9, weight_decay=wd,
    )

    def adjust_lr(optimizer, itr):  # transcribed train.py:138-144
        now_lr = lr0 * (1 - itr / (max_itr + 1)) ** power
        for gi, mult in enumerate((1, 2, 10, 20)):
            optimizer.param_groups[gi]["lr"] = mult * now_lr

    # one real backward for a gradient shaped like training's
    rng = np.random.RandomState(23)
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    label = rng.randint(0, 21, size=(1, 64, 96)).astype(np.int64)
    pred_t = tmodel(torch.from_numpy(x))
    torch.nn.CrossEntropyLoss(ignore_index=255)(
        pred_t, torch.from_numpy(label)
    ).backward()
    g0_t = {n: p.grad.detach().clone() for n, p in tmodel.named_parameters()
            if p.grad is not None}

    # --- our side: same converted state and the SAME gradients (the torch
    # backward's, name-mapped like the weights) so the comparison isolates
    # optimizer semantics from framework forward/backward numerics (those are
    # covered by test_deeplabv1_gradients_match_reference) ---
    model = generate_net(EXPERIMENTS["SEAM_deeplabv1_resnet38"])
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "dropout": k}, jnp.zeros((1, 64, 96, 3), jnp.float32)
    )
    params_c, stats_c = _convert_seg_state_dict(tmodel.state_dict())
    params = merge_params(variables["params"], params_c)

    g_c, _ = _convert_seg_state_dict(g0_t)
    g0_j = merge_params(jax.tree.map(jnp.zeros_like, params), g_c)

    tx = poly_sgd(lr0, wd, max_step=max_itr + 1, power=power, momentum=0.9,
                  labels=seg_param_labels(params))
    opt_state = tx.init(params)

    factors = (1.0, 0.5, 1.7)
    for itr, c in enumerate(factors):
        with torch.no_grad():
            for n, p in tmodel.named_parameters():
                if n in g0_t:
                    p.grad = g0_t[n] * c
        adjust_lr(opt, itr)
        opt.step()

        gj = jax.tree.map(lambda g: g * c, g0_j)
        updates, opt_state = tx.update(gj, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    named = dict(tmodel.named_parameters())
    targets = [
        ("cls_conv.weight", ("cls_conv", "kernel")),
        ("cls_conv.bias", ("cls_conv", "bias")),
        ("conv_fov.weight", ("conv_fov", "kernel")),
        ("backbone.b7.conv_branch2a.weight",
         ("backbone", "resnet38", "b7", "conv_branch2a", "kernel")),
        ("backbone.b3.conv_branch2a.weight",
         ("backbone", "resnet38", "b3", "conv_branch2a", "kernel")),
    ]
    for tname, jpath in targets:
        want = named[tname].detach().numpy()
        if want.ndim == 4:
            want = want.transpose(2, 3, 1, 0)
        got = params
        for kk in jpath:
            got = got[kk]
        got = np.asarray(got)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        assert err < 1e-3, (tname, err)

    # BN affine never moves (reference never collects it into a group)
    bn_w = np.asarray(params["bn_fov"]["scale"])
    bn_w0 = named["bn_fov.weight"].detach().numpy()
    np.testing.assert_allclose(bn_w, bn_w0, rtol=1e-6)


@pytest.mark.slow
def test_seg_train_mode_trajectory_parity(ref_seg, monkeypatch):
    """Stage-3 FULL train-mode trajectory vs the literal reference, as-run.

    The reference's experiment drivers never call net.train()/eval()
    (experiment/SEAM_deeplabv1_resnet38/train.py — torch modules default to
    training mode), so during stage-3 training the resnet38 backbone's
    BN-freeze override (backbone/resnet38d.py:192-212) is dead code: backbone
    BN normalizes with BATCH statistics (momentum 3e-4 running updates) and
    conv1a trains. This test locks that as-run semantics in: 8 consecutive
    steps of {forward(train) -> CE(ignore 255) -> backward -> poly SGD} on
    both sides from the same converted state and fixed data, comparing the
    loss trajectory, final parameters, and final BN running statistics.

    Dropout is made deterministic identically on both sides: torch dropout
    modules are replaced with their expectation-preserving scale x/(1-p), and
    jax.random.bernoulli is patched to all-True so Dropout2d/the head mask
    reduce to the same x/(1-p) scale (layers.py:74-79, deeplab.py:151-153).

    Envelopes are ~6-10x the measured drift (loss rel <=9.4e-7 per step over
    8 steps, final params <=1.6e-5, running stats <=4.8e-7 on this config).
    At the production lr with a raw kaiming-init head the trajectory map is
    expansive (|logits|~15, CE~13.7) and amplifies any cross-framework 1e-7
    difference ~200x per step (measured: loss rel 3e-7 -> 8e-2 in 8 steps) —
    same dichotomy as stage 1; the assertion runs in the contractive regime
    (cls_conv scaled to CE~ln(21), lr 2e-4) where drift measures numerics.
    """
    import jax
    import jax.numpy as jnp
    import torch.optim as optim

    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net, seg_param_labels
    from wseg_tpu.train.optim import poly_sgd
    from wseg_tpu.train.seg import SegTrainState, make_seg_train_step
    from wseg_tpu.utils.checkpoint import merge_params

    torch.manual_seed(7)
    cfg_t = SimpleNamespace(
        MODEL_BACKBONE="resnet38", MODEL_BACKBONE_PRETRAIN=False,
        TRAIN_BN_MOM=3e-4, MODEL_NUM_CLASSES=21,
    )
    tmodel = ref_seg.deeplabv1(cfg_t)
    _randomize_bn(tmodel)
    # NB: no tmodel.train()/eval() — the reference-as-run module mode
    assert tmodel.training and tmodel.backbone.bn7.training
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.forward = (lambda x, s=1.0 / (1.0 - m.p): x * s)

    # contractive-lr regime: at the reference's production lr the random-init
    # head (x10/x20 groups) diverges within 3 steps and the trajectory map is
    # chaotic — the same dichotomy measured for stage 1
    # (tests/test_trajectory_parity.py docstring); 2e-4 keeps the map
    # contractive so drift measures framework numerics, not chaos
    lr0, wd, power, max_itr, steps = 2e-4, 5e-4, 0.9, 8, 8
    pgs = tmodel.get_parameter_groups()
    # conv1a is collected (requires_grad stays True in the as-run mode)
    assert any(p is tmodel.backbone.conv1a.weight for p in pgs[0])
    opt = optim.SGD(
        params=[
            {"params": pgs[0], "lr": lr0, "weight_decay": wd},
            {"params": pgs[1], "lr": 2 * lr0, "weight_decay": 0},
            {"params": pgs[2], "lr": 10 * lr0, "weight_decay": wd},
            {"params": pgs[3], "lr": 20 * lr0, "weight_decay": 0},
        ],
        momentum=0.9, weight_decay=wd,
    )

    def adjust_lr(optimizer, itr):  # train.py:138-144
        now_lr = lr0 * (1 - itr / (max_itr + 1)) ** power
        for gi, mult in enumerate((1, 2, 10, 20)):
            optimizer.param_groups[gi]["lr"] = mult * now_lr

    rng = np.random.RandomState(31)
    data = []
    for _ in range(steps):
        x = rng.rand(2, 3, 48, 64).astype(np.float32)
        lab = rng.randint(0, 21, size=(2, 48, 64)).astype(np.int64)
        lab[rng.rand(*lab.shape) < 0.1] = 255
        data.append((x, lab))

    # tame the starting point: kaiming-init cls_conv on 512 channels yields
    # |logits| ~ 15 (CE ~ 13.7, most pixels confidently wrong), and that
    # regime amplifies any 1e-7 cross-framework difference ~200x per step.
    # Scaling cls_conv down puts the start at CE ~= ln(21) where the map is
    # contractive and drift measures numerics, not gradient blow-up. (The
    # BN-normalized conv_fov/conv_fov2 scales are irrelevant: batch-mode BN
    # is scale-invariant.)
    with torch.no_grad():
        tmodel.cls_conv.weight.mul_(0.02)
        tmodel.cls_conv.bias.zero_()
    sd0 = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    crit = torch.nn.CrossEntropyLoss(ignore_index=255)
    t_losses = []
    for itr, (x, lab) in enumerate(data):
        adjust_lr(opt, itr)
        opt.zero_grad()
        loss = crit(tmodel(torch.from_numpy(x)), torch.from_numpy(lab))
        loss.backward()
        opt.step()
        t_losses.append(loss.item())

    # --- our side: same converted state, same data, jitted train step ---
    model = generate_net(EXPERIMENTS["SEAM_deeplabv1_resnet38"])
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "dropout": k}, jnp.zeros((2, 48, 64, 3), jnp.float32)
    )
    params_c, stats_c = _convert_seg_state_dict(sd0)
    params = merge_params(variables["params"], params_c)
    batch_stats = merge_params(variables["batch_stats"], stats_c)

    monkeypatch.setattr(
        jax.random, "bernoulli",
        lambda key, p=0.5, shape=None: jnp.ones(shape if shape is not None else (), bool),
    )

    tx = poly_sgd(lr0, wd, max_step=max_itr + 1, power=power, momentum=0.9,
                  labels=seg_param_labels(params))
    state = SegTrainState(params, tx.init(params), batch_stats, jax.random.PRNGKey(5))
    step_fn = make_seg_train_step(model, tx)

    j_losses = []
    for x, lab in data:
        state, metrics = step_fn(
            state, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(lab)
        )
        j_losses.append(float(metrics["loss"]))

    rels = [abs(lt - lj) / (abs(lt) + 1e-12)
            for lt, lj in zip(t_losses, j_losses)]
    print("loss rel per step:", [f"{r:.2e}" for r in rels])
    print("torch losses:", [f"{v:.4f}" for v in t_losses])
    for s, rel in enumerate(rels):
        assert rel < 1e-5, (s, t_losses[s], j_losses[s], rel)

    named = dict(tmodel.named_parameters())
    targets = [
        ("cls_conv.weight", ("cls_conv", "kernel"), 1e-4),
        ("conv_fov.weight", ("conv_fov", "kernel"), 1e-4),
        ("backbone.conv1a.weight", ("backbone", "resnet38", "conv1a", "kernel"), 1e-4),
        ("backbone.b4.conv_branch2a.weight",
         ("backbone", "resnet38", "b4", "conv_branch2a", "kernel"), 1e-4),
        ("backbone.b7.conv_branch2a.weight",
         ("backbone", "resnet38", "b7", "conv_branch2a", "kernel"), 1e-4),
    ]
    for tname, jpath, tol in targets:
        want = named[tname].detach().numpy()
        if want.ndim == 4:
            want = want.transpose(2, 3, 1, 0)
        got = state.params
        for kk in jpath:
            got = got[kk]
        got = np.asarray(got)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        print(f"param drift {tname}: {err:.2e}")
        assert err < tol, (tname, err)
        # ... and each target actually moved from its initial value
        init = params
        for kk in jpath:
            init = init[kk]
        assert np.abs(got - np.asarray(init)).max() > 0, tname

    # BN running statistics track the torch updates (backbone batch mode +
    # head BN, momentum 3e-4)
    tsd = tmodel.state_dict()
    stat_targets = [
        ("bn_fov.running_mean", ("bn_fov", "mean")),
        ("bn_fov.running_var", ("bn_fov", "var")),
        ("backbone.b3.bn_branch2a.running_mean",
         ("backbone", "resnet38", "b3", "bn_branch2a", "mean")),
        ("backbone.bn7.running_var", ("backbone", "resnet38", "bn7", "var")),
    ]
    for tname, jpath in stat_targets:
        want = tsd[tname].numpy()
        got = state.batch_stats
        for kk in jpath:
            got = got[kk]
        got = np.asarray(got)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        print(f"stat drift {tname}: {err:.2e}")
        assert err < 1e-5, (tname, err)
        init = batch_stats
        for kk in jpath:
            init = init[kk]
        assert np.abs(got - np.asarray(init)).max() > 0, tname
