"""File-based weight-import round trips.

The literal-reference oracles (tests/test_reference_oracle.py) convert
state_dicts IN MEMORY; these tests go through the FILES and the CLI flag
paths the reference uses:

* `.pth` saved by torch.save -> `contrast_infer --weights x.pth` (the CLI's
  load_pretrained + merge_params route, contrast_train.py:98-106) -> outputs
  byte-identical to the in-memory-converted inferencer;
* `.pth` -> AffinityNet forward parity vs the literal reference module;
* a synthesized MXNet `.params` binary (the `mxnet.nd.save` list format, V3 +
  V2 + legacy NDArray records) -> `read_mxnet_params` exact bytes ->
  `convert_mxnet_params` name mapping (resnet38d.py:216-264) -> merged into a
  live model tree.
"""

import os
import struct
import sys

import numpy as np
import pytest
import torch

from test_reference_oracle import _load_into_jax, _randomize_bn, _rel_err, ref  # noqa: F401


@pytest.mark.slow
def test_pth_file_through_contrast_infer_cli(ref, tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from wseg_tpu.cli import contrast_infer
    from wseg_tpu.data.voc12 import VOC12ClsDatasetMSF
    from wseg_tpu.infer.cam import CamInferencer
    from wseg_tpu.models import build_model

    torch.manual_seed(23)
    oracle = ref["contrast"].Net()
    oracle.eval()
    _randomize_bn(oracle)
    pth = str(tmp_path / "contrast.pth")
    torch.save(oracle.state_dict(), pth)

    # one-image synthetic root
    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(71, 89, 3) * 255).astype(np.uint8)).save(
        root / "JPEGImages" / "2007_000001.jpg"
    )
    (root / "Annotations" / "2007_000001.xml").write_text(
        "<annotation><object><name>dog</name></object></annotation>"
    )
    lst = tmp_path / "list.txt"
    lst.write_text("2007_000001\n")

    out_cam = str(tmp_path / "cam")
    contrast_infer.main([
        "--weights", pth, "--infer_list", str(lst), "--voc12_root", str(root),
        "--out_cam", out_cam, "--num_workers", "1",
    ])

    # in-memory conversion reference (the oracle-tested route)
    model, variables = _load_into_jax("contrast", oracle.state_dict())
    ds = VOC12ClsDatasetMSF(str(lst), str(root))
    _, views, label, orig_hw = ds[0]
    want = CamInferencer(model, variables, bucket=64).infer_one(
        views, np.asarray(label), orig_hw
    )
    got = np.load(os.path.join(out_cam, "2007_000001.npy"), allow_pickle=True).item()
    assert sorted(got.keys()) == [11]  # dog
    np.testing.assert_array_equal(got[11], want[11])


@pytest.mark.slow
def test_pth_file_roundtrip_affinity_forward(ref, tmp_path):
    import jax.numpy as jnp

    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import load_pretrained, merge_params

    torch.manual_seed(29)
    oracle = ref["aff"].Net()
    oracle.eval()
    _randomize_bn(oracle)
    pth = str(tmp_path / "aff.pth")
    torch.save(oracle.state_dict(), pth)

    import jax

    model = build_model("affinity")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    lp, ls = load_pretrained(pth)  # the CLI --weights route (cli/aff_infer.py)
    variables = {
        "params": merge_params(variables["params"], lp),
        "batch_stats": merge_params(variables["batch_stats"], ls),
    }

    x = np.random.RandomState(7).randn(1, 64, 64, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = oracle(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), to_dense=True)
    got = np.asarray(model.apply(variables, jnp.asarray(x), to_dense=True))
    assert _rel_err(got, want.numpy()) < 5e-3


# ---------------------------------------------------------------------------
# synthetic MXNet .params
# ---------------------------------------------------------------------------

_ND_V3 = 0xF993FACA
_ND_V2 = 0xF993FAC9


def _mx_record(arr: np.ndarray, vintage: str) -> bytes:
    """One NDArray record in the chosen on-disk vintage."""
    arr = np.ascontiguousarray(arr, np.float32)
    out = b""
    if vintage == "v3":
        out += struct.pack("<I", _ND_V3)
        out += struct.pack("<i", 0)  # stype dense
        out += struct.pack("<I", arr.ndim)
        for d in arr.shape:
            out += struct.pack("<q", d)
    elif vintage == "v2":
        out += struct.pack("<I", _ND_V2)
        out += struct.pack("<i", 0)
        out += struct.pack("<I", arr.ndim)
        for d in arr.shape:
            out += struct.pack("<I", d)
    else:  # legacy: leading uint32 is ndim
        out += struct.pack("<I", arr.ndim)
        for d in arr.shape:
            out += struct.pack("<I", d)
    out += struct.pack("<i", 1)  # dev_type (cpu)
    out += struct.pack("<i", 0)  # dev_id
    out += struct.pack("<i", 0)  # dtype float32
    out += arr.tobytes()
    return out


def _write_mx_params(path: str, named: list[tuple[str, np.ndarray, str]]):
    """mxnet `nd.save` list container: uint64 magic 0x112, uint64 reserved,
    uint64 count, records, uint64 name count, (uint64 len, bytes) names."""
    out = struct.pack("<QQQ", 0x112, 0, len(named))
    for _, arr, vintage in named:
        out += _mx_record(arr, vintage)
    out += struct.pack("<Q", len(named))
    for name, _, _ in named:
        b = name.encode()
        out += struct.pack("<Q", len(b)) + b
    open(path, "wb").write(out)


def test_synthetic_mxnet_params_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import (
        convert_mxnet_params, merge_params, read_mxnet_params,
    )

    rng = np.random.RandomState(3)
    # OIHW conv shapes matching the real backbone; one record per vintage
    named = [
        ("arg:conv1a_weight", rng.randn(64, 3, 3, 3).astype(np.float32), "v3"),
        ("arg:res2a_branch2a_weight", rng.randn(128, 64, 3, 3).astype(np.float32), "v2"),
        ("arg:res4b3_branch2b1_weight",
         rng.randn(512, 512, 3, 3).astype(np.float32), "legacy"),
        ("arg:bn2a_branch2a_gamma", rng.rand(64).astype(np.float32), "v3"),
        ("arg:bn2a_branch2a_beta", rng.randn(64).astype(np.float32), "v2"),
        ("aux:bn2a_branch2a_moving_mean", rng.randn(64).astype(np.float32), "v3"),
        ("aux:bn2a_branch2a_moving_var", rng.rand(64).astype(np.float32), "legacy"),
        ("arg:bn7_gamma", rng.rand(4096).astype(np.float32), "v3"),
        ("aux:bn7_moving_mean", rng.randn(4096).astype(np.float32), "v3"),
        ("arg:linear1000_weight", rng.randn(1000, 4096).astype(np.float32), "v3"),
    ]
    path = str(tmp_path / "synthetic.params")
    _write_mx_params(path, named)

    # 1. raw reader: exact bytes back, names preserved
    raw = read_mxnet_params(path)
    assert sorted(raw.keys()) == sorted(n for n, _, _ in named)
    for name, arr, _ in named:
        np.testing.assert_array_equal(raw[name], arr)

    # 2. rename + transpose mapping (resnet38d.py:216-264 semantics)
    params, stats = convert_mxnet_params(path)
    np.testing.assert_array_equal(
        params["backbone"]["conv1a"]["kernel"], named[0][1].transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(
        params["backbone"]["b2"]["conv_branch2a"]["kernel"],
        named[1][1].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        params["backbone"]["b4_3"]["conv_branch2b1"]["kernel"],
        named[2][1].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        params["backbone"]["b2"]["bn_branch2a"]["scale"], named[3][1]
    )
    np.testing.assert_array_equal(
        stats["backbone"]["b2"]["bn_branch2a"]["mean"], named[5][1]
    )
    np.testing.assert_array_equal(stats["backbone"]["bn7"]["mean"], named[8][1])
    assert "linear1000" not in str(params)  # classifier head dropped

    # 3. end-to-end: the arrays land in a live model tree via merge_params
    model = build_model("seam")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    merged = merge_params(variables["params"], params)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["conv1a"]["kernel"]),
        named[0][1].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["b4_3"]["conv_branch2b1"]["kernel"]),
        named[2][1].transpose(2, 3, 1, 0),
    )


@pytest.mark.slow
def test_stage1_ckpt_into_aff_train_cli(tmp_path):
    """aff_train --weights with a STAGE-1 (contrast) .ckpt: the affinity
    model adds f8_5, which the stage-1 tree lacks — the loader must do a
    partial merge (reference load_state_dict(strict=False) semantics,
    aff_train.py weight load), not a structure-strict flax restore.
    Regression for a crash found driving the CLI on the chip (round 3)."""
    import jax
    import jax.numpy as jnp

    from test_cli_train_dp import _make_aff_root
    from wseg_tpu.cli import aff_train
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    contrast = build_model("contrast")
    v = contrast.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    ckpt = tmp_path / "contrast.ckpt"
    save_checkpoint(str(ckpt), v)

    root, lst, la, ha = _make_aff_root(tmp_path, n_imgs=2)
    cwd = os.getcwd()
    rundir = tmp_path / "run"
    rundir.mkdir()
    os.chdir(rundir)
    try:
        aff_train.main([
            "--batch_size", "2", "--max_epoches", "1",
            "--train_list", lst, "--voc12_root", root,
            "--la_crf_dir", la, "--ha_crf_dir", ha,
            "--crop_size", "64", "--num_workers", "1",
            "--weights", str(ckpt),
            "--session_name", "t", "--seed", "7",
        ])
    finally:
        os.chdir(cwd)

    out = load_checkpoint(str(rundir / "result" / "t" / "aff.ckpt"), None)
    # backbone came from the stage-1 file; f8_5 exists (fresh init), trained
    assert "f8_5" in out["params"]
    conv1a = np.asarray(out["params"]["backbone"]["conv1a"]["kernel"])
    assert np.all(np.isfinite(conv1a))
