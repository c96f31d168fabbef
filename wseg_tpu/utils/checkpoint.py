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
    """Atomically serialize `tree` to `path`.

    Resumable trainers overwrite one checkpoint path in place every epoch; a
    kill mid-write (the exact scenario --resume targets) must never truncate
    the only resume state. Write to a temp file in the same directory and
    os.replace() it over the target (atomic on POSIX).
    """
    from flax import serialization

    dirname = os.path.dirname(path) or "."
    os.makedirs(dirname, exist_ok=True)
    tmp = os.path.join(dirname, f".{os.path.basename(path)}.tmp.{os.getpid()}")
    try:
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(tree))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


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
        # np.array (copy), NOT np.asarray: torch's .numpy() SHARES storage
        # with the live tensor, and a later in-place mutation on the torch
        # side (optimizer.step) would silently change the converted params
        arr = np.array(getattr(val, "numpy", lambda: val)())
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
#
# File layout (mxnet `NDArray::Save` list format): uint64 list magic 0x112,
# uint64 reserved, uint64 count, then per array a legacy NDArray record, then
# uint64 name count + (uint64 len, bytes) names. NDArray records come in
# several vintages; this reader handles the ones seen in the wild:
#   V2/V3 magic (0xF993FAC9 / 0xF993FACA): [int32 stype (V2+)], uint32 ndim,
#     dims (uint32 for V2, int64 for V3), int32 dev_type, int32 dev_id,
#     int32 dtype, raw data
#   legacy (no magic): TShape as uint32 ndim + uint32 dims, context, dtype.
# ---------------------------------------------------------------------------

_MX_LIST_MAGIC = 0x112
_ND_V2_MAGIC = 0xF993FAC9
_ND_V3_MAGIC = 0xF993FACA

_MX_DTYPES = {0: np.float32, 1: np.float64, 2: np.float16, 3: np.uint8, 4: np.int32}


def _read_mx_ndarray(buf, off: int):
    def u32(o):
        return int(np.frombuffer(buf, np.uint32, 1, o)[0]), o + 4

    def i32(o):
        return int(np.frombuffer(buf, np.int32, 1, o)[0]), o + 4

    def i64(o):
        return int(np.frombuffer(buf, np.int64, 1, o)[0]), o + 8

    magic, off2 = u32(off)
    if magic in (_ND_V2_MAGIC, _ND_V3_MAGIC):
        off = off2
        stype, off = i32(off)
        if stype not in (-1, 0):  # only dense supported
            raise ValueError(f"unsupported mxnet storage type {stype}")
        ndim, off = u32(off)
        dims = []
        for _ in range(ndim):
            if magic == _ND_V3_MAGIC:
                d, off = i64(off)
            else:
                d, off = u32(off)
            dims.append(d)
        _, off = i32(off)  # dev_type
        _, off = i32(off)  # dev_id
        dtype_flag, off = i32(off)
    else:
        # legacy record: magic was actually ndim
        ndim = magic
        off = off2
        if ndim > 8:
            raise ValueError(f"unparseable mxnet record at offset {off - 4}")
        dims = []
        for _ in range(ndim):
            d, off = u32(off)
            dims.append(d)
        _, off = i32(off)
        _, off = i32(off)
        dtype_flag, off = i32(off)
    dtype = _MX_DTYPES[dtype_flag]
    count = int(np.prod(dims)) if dims else 1
    arr = np.frombuffer(buf, dtype, count, off).reshape(dims).copy()
    off += count * dtype().itemsize
    return arr, off


def read_mxnet_params(params_path: str) -> dict[str, np.ndarray]:
    """Parse a `mxnet.nd.save`-format file into {name: array}."""
    buf = open(params_path, "rb").read()
    header = np.frombuffer(buf, np.uint64, 3, 0)
    if int(header[0]) != _MX_LIST_MAGIC:
        raise ValueError(
            f"{params_path}: not an mxnet NDArray list (magic {header[0]:#x}); "
            "convert to .pth with the reference's convert_mxnet_to_torch instead"
        )
    count = int(header[2])
    off = 24
    arrays = []
    for _ in range(count):
        arr, off = _read_mx_ndarray(buf, off)
        arrays.append(arr)
    n_names = int(np.frombuffer(buf, np.uint64, 1, off)[0])
    off += 8
    names = []
    for _ in range(n_names):
        ln = int(np.frombuffer(buf, np.uint64, 1, off)[0])
        off += 8
        names.append(buf[off : off + ln].decode())
        off += ln
    assert len(names) == len(arrays), (len(names), len(arrays))
    return dict(zip(names, arrays))


def _mxnet_key_to_flax(key: str) -> tuple[list[str], str] | None:
    """Rename an MXNet ResNet-38 param to our tree — same mapping as the
    reference's convert_mxnet_to_torch (network/resnet38d.py:216-264).

    MXNet names look like 'arg:convXa_branch2a_weight',
    'aux:bnXa_branch2a_moving_mean', 'arg:bn7_gamma', 'arg:conv1a_weight'.
    """
    key = key.split(":", 1)[-1]  # strip arg:/aux:
    bn_map = {"beta": "bias", "gamma": "scale", "mean": "mean", "var": "var"}
    toks = key.split("_")
    if "conv1a" in toks[0]:
        return ["backbone", "conv1a", "kernel"], "conv"
    if "linear1000" in toks[0]:
        return None  # classifier head, dropped (resnet38d.py:233-234)
    if len(toks) >= 2 and "branch" in toks[1]:
        stage = toks[0]
        # resXa -> bX ; resX_unitY... reference: last char != 'a' => bN_M
        if stage[-1] != "a":
            block = "b" + stage[-3] + "_" + stage[-1]
        else:
            block = "b" + stage[-2]
        if "res" in stage or "conv" in stage[:4]:
            layer = "conv_" + toks[1]
            leaf = "kernel"
            kind = "conv"
        else:  # bn
            layer = "bn_" + toks[1]
            raw = toks[-1]
            if raw in ("mean", "var"):
                kind = "bn_stat"
            else:
                kind = "bn_affine"
            leaf = bn_map[raw]
        return ["backbone", block, layer, leaf], kind
    # trailing bn7 params: bn7_gamma / bn7_beta / bn7_moving_mean ...
    raw = toks[-1]
    kind = "bn_stat" if raw in ("mean", "var") else "bn_affine"
    return ["backbone", "bn7", bn_map[raw]], kind


def convert_mxnet_params(params_path: str) -> tuple[dict, dict]:
    """ImageNet-pretrained `.params` -> (params, batch_stats) trees, renamed
    per convert_mxnet_to_torch (resnet38d.py:216-264); conv kernels
    transposed OIHW -> HWIO."""
    raw = read_mxnet_params(params_path)
    params: dict = {}
    batch_stats: dict = {}
    for key, arr in raw.items():
        mapped = _mxnet_key_to_flax(key)
        if mapped is None:
            continue
        path, kind = mapped
        if kind == "conv":
            _assign(params, path, arr.transpose(2, 3, 1, 0).astype(np.float32))
        elif kind == "bn_affine":
            _assign(params, path, arr.astype(np.float32))
        else:
            _assign(batch_stats, path, arr.astype(np.float32))
    return params, batch_stats


def load_pretrained(weights_path: str) -> tuple[dict, dict]:
    """Dispatch on extension like contrast_train.py:98-104."""
    if weights_path.endswith(".params"):
        return convert_mxnet_params(weights_path)
    if weights_path.endswith(".pth"):
        return convert_torch_checkpoint(weights_path)
    # native msgpack checkpoint: caller should use load_checkpoint with a target
    raise ValueError(f"unknown checkpoint format: {weights_path}")


def merge_params(init_params: dict, loaded: dict, strict: bool = False,
                 what: str = "") -> dict:
    """Overlay loaded params onto an init tree, ignoring missing/mismatched
    entries like `load_state_dict(strict=False)` (contrast_train.py:106).

    With `what` set (e.g. "params from x.ckpt"), prints how many leaves
    matched and warns when NONE did — a structurally alien file would
    otherwise "load" silently and train from random init."""
    counts = [0, 0]  # merged, total init leaves

    def merge(init_node, loaded_node, path=""):
        if not isinstance(init_node, dict):
            counts[1] += 1
            if loaded_node is None:
                return init_node
            if np.shape(loaded_node) != np.shape(init_node):
                if strict:
                    raise ValueError(f"shape mismatch at {path}")
                return init_node
            counts[0] += 1
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

    out = merge(init_params, loaded)
    if what:
        print(f"merged {counts[0]}/{counts[1]} {what}")
        if counts[0] == 0 and counts[1] > 0:
            import warnings

            warnings.warn(
                f"no {what} matched the model tree — the file's structure "
                "does not overlap this model; everything stays at init"
            )
    return out
