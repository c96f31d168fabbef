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
        arr = val.numpy()
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
