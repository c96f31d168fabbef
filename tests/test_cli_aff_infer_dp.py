"""Data-parallel random-walk refinement from the CLI: `aff_infer.main()`
over the 8-virtual-device CPU mesh must produce byte-identical pseudo masks
to the single-device `refine_one` path, including for chunks that MIX
bucket shapes (stage-2 counterpart of
tests/test_cli_infer_dp.py; the reference's aff_infer.py refines one image
on one GPU at a time)."""

import os

import numpy as np
import pytest


def _make_inputs(tmp_path, sizes):
    from PIL import Image

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    cam_dir = tmp_path / "cam"
    cam_dir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i, (h, w) in enumerate(sizes):
        name = f"2007_{i:06d}"
        names.append(name)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / "JPEGImages" / f"{name}.jpg"
        )
        cam = {c: rng.rand(h, w).astype(np.float32) for c in (4 + i, 10)}
        np.save(cam_dir / f"{name}.npy", cam)
    lst = tmp_path / "list.txt"
    lst.write_text("".join(n + "\n" for n in names))
    return str(root), str(cam_dir), str(lst), names


@pytest.mark.slow
def test_cli_aff_infer_data_parallel_matches_single_device(tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    assert len(jax.devices()) == 8  # conftest CPU mesh

    from wseg_tpu.cli import aff_infer
    from wseg_tpu.data.transforms import Normalize
    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import save_checkpoint

    # mixed BUCKETS on purpose: the last image pads to (128, 192)
    # while the others pad to (128, 128) — refine_batch must group by
    # bucket, not pad everything to the chunk max
    sizes = [(75, 93), (70, 90), (66, 95), (100, 130)]
    root, cam_dir, lst, names = _make_inputs(tmp_path, sizes)

    model = build_model("affinity")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    ckpt = str(tmp_path / "aff.ckpt")
    save_checkpoint(ckpt, variables)

    out_rw = str(tmp_path / "rw")
    aff_infer.main([
        "--weights", ckpt, "--infer_list", lst, "--voc12_root", root,
        "--cam_dir", cam_dir, "--out_rw", out_rw, "--num_workers", "2",
        "--logt", "2",
    ])

    refiner = RandomWalkRefiner(model, variables, logt=2, bucket=64)
    normalize = Normalize()
    for i, name in enumerate(names):
        h, w = sizes[i]
        img = np.array(
            Image.open(os.path.join(root, "JPEGImages", name + ".jpg")).convert("RGB")
        )
        cam_dict = np.load(
            os.path.join(cam_dir, name + ".npy"), allow_pickle=True
        ).item()
        cam_full = np.zeros((h, w, 21), np.float32)
        for k, v in cam_dict.items():
            cam_full[..., k + 1] = v
        cam_full[..., 0] = 0.27
        want = refiner.refine_one(normalize(img), cam_full)
        got = np.array(Image.open(os.path.join(out_rw, name + ".png")))
        np.testing.assert_array_equal(got, want)
