"""Checkpoint I/O + weight converter tests (torch .pth and mxnet .params)."""

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np
import torch

from wseg_tpu.models import build_model
from wseg_tpu.utils.checkpoint import (
    convert_mxnet_params,
    convert_torch_state_dict,
    load_checkpoint,
    merge_params,
    read_mxnet_params,
    save_checkpoint,
)


def test_save_load_roundtrip(tmp_path):
    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    p = tmp_path / "x.ckpt"
    save_checkpoint(str(p), tree)
    loaded = load_checkpoint(str(p), {"params": {"a": np.zeros((2, 3), np.float32)}})
    np.testing.assert_array_equal(loaded["params"]["a"], tree["params"]["a"])


def test_save_checkpoint_is_atomic(tmp_path, monkeypatch):
    """ADVICE r4 (medium): per-epoch resumable checkpoints overwrite one path
    in place; a kill mid-save (the exact scenario --resume targets) must not
    truncate the only resume state. save_checkpoint writes a temp file and
    os.replace()s it — a crash during serialization leaves the old file."""
    import os

    from flax import serialization

    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    p = tmp_path / "x.ckpt"
    save_checkpoint(str(p), tree)
    # a normal save leaves no temp litter
    assert [f for f in os.listdir(tmp_path) if f != "x.ckpt"] == []
    original = p.read_bytes()

    def boom(_tree):
        raise RuntimeError("simulated kill mid-serialization")

    monkeypatch.setattr(serialization, "to_bytes", boom)
    try:
        save_checkpoint(str(p), {"params": {"a": np.zeros((2, 3), np.float32)}})
    except RuntimeError:
        pass
    # the prior checkpoint survives byte-identical; no partial temp remains
    assert p.read_bytes() == original
    assert [f for f in os.listdir(tmp_path) if f != "x.ckpt"] == []


def test_convert_torch_state_dict_covers_contrast_net():
    """Every reference state_dict key for the contrast net maps into our init
    tree with the right shapes."""
    state = {
        "conv1a.weight": torch.zeros(64, 3, 3, 3),
        "b2.bn_branch2a.weight": torch.ones(64),
        "b2.bn_branch2a.bias": torch.zeros(64),
        "b2.bn_branch2a.running_mean": torch.zeros(64),
        "b2.bn_branch2a.running_var": torch.ones(64),
        "b2.bn_branch2a.num_batches_tracked": torch.tensor(0),
        "b2.conv_branch2a.weight": torch.zeros(128, 64, 3, 3),
        "bn7.weight": torch.ones(4096),
        "bn7.running_mean": torch.zeros(4096),
        "fc8.weight": torch.zeros(21, 4096, 1, 1),
        "fc_proj.weight": torch.zeros(128, 4096, 1, 1),
        "f9.weight": torch.zeros(192, 195, 1, 1),
    }
    params, stats = convert_torch_state_dict(state)
    assert params["backbone"]["conv1a"]["kernel"].shape == (3, 3, 3, 64)
    assert params["backbone"]["b2"]["conv_branch2a"]["kernel"].shape == (3, 3, 64, 128)
    assert params["fc8"]["kernel"].shape == (1, 1, 4096, 21)
    assert stats["backbone"]["b2"]["bn_branch2a"]["mean"].shape == (64,)
    assert stats["backbone"]["bn7"]["mean"].shape == (4096,)

    # merge into a real init tree: overlapping leaves must be accepted
    model = build_model("contrast")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    merged = merge_params(variables["params"], params)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["conv1a"]["kernel"]), 0.0
    )


def _write_mx_nd_v2(a: np.ndarray) -> bytes:
    out = struct.pack("<I", 0xF993FAC9)
    out += struct.pack("<i", 0)  # dense stype
    out += struct.pack("<I", a.ndim) + b"".join(struct.pack("<I", d) for d in a.shape)
    out += struct.pack("<ii", 1, 0)  # cpu(0)
    out += struct.pack("<i", 0)  # float32
    out += a.astype("<f4").tobytes()
    return out


def test_read_mxnet_params_and_rename(tmp_path):
    arrays = {
        "arg:conv1a_weight": np.random.rand(64, 3, 3, 3).astype(np.float32),
        "arg:res3a_branch2a_weight": np.random.rand(256, 128, 3, 3).astype(np.float32),
        "arg:bn3a_branch2a_gamma": np.ones(128, np.float32),
        "aux:bn3a_branch2a_moving_mean": np.zeros(128, np.float32),
        "arg:bn7_gamma": np.ones(8, np.float32),
        "aux:bn7_moving_var": np.ones(8, np.float32),
        "arg:linear1000_weight": np.zeros((10, 8), np.float32),
    }
    buf = io.BytesIO()
    buf.write(struct.pack("<QQQ", 0x112, 0, len(arrays)))
    for a in arrays.values():
        buf.write(_write_mx_nd_v2(a))
    buf.write(struct.pack("<Q", len(arrays)))
    for name in arrays:
        nb = name.encode()
        buf.write(struct.pack("<Q", len(nb)) + nb)
    path = tmp_path / "test.params"
    path.write_bytes(buf.getvalue())

    raw = read_mxnet_params(str(path))
    assert set(raw) == set(arrays)
    np.testing.assert_array_equal(raw["arg:conv1a_weight"], arrays["arg:conv1a_weight"])

    params, stats = convert_mxnet_params(str(path))
    assert params["backbone"]["conv1a"]["kernel"].shape == (3, 3, 3, 64)
    assert params["backbone"]["b3"]["conv_branch2a"]["kernel"].shape == (3, 3, 128, 256)
    assert params["backbone"]["b3"]["bn_branch2a"]["scale"].shape == (128,)
    assert stats["backbone"]["b3"]["bn_branch2a"]["mean"].shape == (128,)
    assert stats["backbone"]["bn7"]["var"].shape == (8,)
    assert "linear1000" not in str(params)


def test_merge_params_reports_and_warns_on_alien_tree():
    """merge_params with `what` prints merged/total counts and warns when a
    structurally alien file matches NOTHING — a silent total no-op would
    otherwise 'load' and train from random init (round-3 review finding)."""
    import warnings

    from wseg_tpu.utils.checkpoint import merge_params

    init = {"a": {"k": np.zeros((2, 2), np.float32)}, "b": np.zeros(3, np.float32)}
    out = merge_params(init, {"a": {"k": np.ones((2, 2))}}, what="params from t")
    assert out["a"]["k"].sum() == 4 and out["b"].sum() == 0

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merge_params(init, {"alien": 1}, what="params from alien.ckpt")
    assert any("matched" in str(x.message) for x in w)
