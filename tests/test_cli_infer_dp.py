"""Data-parallel CAM inference from the CLI: `contrast_infer.main()` over the
8-virtual-device CPU mesh must produce the same outputs as the single-device
`infer_one` path (VERDICT r1 next-round #6; replaces the reference's
thread-pool replica parallelism, contrast_infer.py:46-71)."""

import os

import numpy as np
import pytest


def _make_voc(tmp_path, sizes):
    from PIL import Image

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    rng = np.random.RandomState(0)
    names = []
    cats = ["dog", "cat", "bird"]
    for i, (h, w) in enumerate(sizes):
        name = f"2007_{i:06d}"
        names.append(name)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg"
        )
        (root / "Annotations" / f"{name}.xml").write_text(
            f"<annotation><object><name>{cats[i % 3]}</name></object>"
            f"<object><name>person</name></object></annotation>"
        )
    lst = tmp_path / "list.txt"
    lst.write_text("".join(n + "\n" for n in names))
    return str(root), str(lst), names


@pytest.mark.slow
def test_cli_contrast_infer_data_parallel_matches_single_device(tmp_path):
    import jax
    import jax.numpy as jnp

    assert len(jax.devices()) == 8  # conftest CPU mesh

    from wseg_tpu.cli import contrast_infer
    from wseg_tpu.data.voc12 import VOC12ClsDatasetMSF
    from wseg_tpu.infer.cam import CamInferencer
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import save_checkpoint

    # sizes chosen so every scale buckets to the SAME padded dims for all
    # images -> the batched program shapes equal the per-image shapes and the
    # comparison is bitwise
    sizes = [(75, 93), (70, 90), (66, 95)]
    root, lst, names = _make_voc(tmp_path, sizes)

    model = build_model("contrast")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    ckpt = str(tmp_path / "w.ckpt")
    save_checkpoint(ckpt, variables)

    out_cam = str(tmp_path / "cam_dp")
    contrast_infer.main([
        "--weights", ckpt, "--infer_list", lst, "--voc12_root", root,
        "--out_cam", out_cam, "--num_workers", "2",
    ])

    # single-device reference: per-image bucketed infer_one with same weights
    ds = VOC12ClsDatasetMSF(lst, root)
    inf = CamInferencer(model, variables, bucket=64)
    for i, name in enumerate(names):
        _, views, label, orig_hw = ds[i]
        want = inf.infer_one(views, np.asarray(label), orig_hw)
        got = np.load(os.path.join(out_cam, name + ".npy"), allow_pickle=True).item()
        present = np.nonzero(np.asarray(label) > 1e-5)[0]
        assert sorted(got.keys()) == sorted(present.tolist())
        for c in present:
            np.testing.assert_array_equal(got[c], want[c])
