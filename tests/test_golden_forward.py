"""Golden end-to-end forward parity: random torch-oracle weights loaded
through the checkpoint converter must produce matching activations in the
JAX ContrastNet (eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_ref import TorchContrastNet, export_state_dict_reference_names
from wseg_tpu.models import build_model
from wseg_tpu.utils.checkpoint import convert_torch_state_dict, merge_params


@pytest.mark.slow
def test_contrast_forward_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchContrastNet().eval()
    # randomize BN stats so frozen-BN handling is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    state = export_state_dict_reference_names(oracle)
    params, stats = convert_torch_state_dict(state)

    model = build_model("contrast")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), jnp.float32))
    merged_params = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)

    # verify the converter covered EVERY leaf (no silent shape mismatches)
    def count_uncovered(init_tree, loaded_tree):
        n = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(init_tree):
            node = loaded_tree
            try:
                for k in path:
                    node = node[k.key]
            except (KeyError, TypeError):
                n += 1
                continue
            if np.shape(node) != np.shape(leaf):
                n += 1
        return n

    assert count_uncovered(variables["params"], params) == 0
    assert count_uncovered(variables["batch_stats"], stats) == 0

    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32) * 0.5
    want = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = model.apply(
        {"params": merged_params, "batch_stats": merged_stats}, jnp.asarray(x)
    )

    names = ["cam", "cam_rv", "f_proj", "cam_rv_down"]
    for name, g, w in zip(names, got, want):
        w = w.detach().permute(0, 2, 3, 1).numpy()
        g = np.asarray(g)
        scale = np.abs(w).max() + 1e-6
        err = np.abs(g - w).max() / scale
        assert err < 5e-3, (name, err)
