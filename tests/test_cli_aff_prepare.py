"""aff_prepare CLI with the TPU CRF backend: the image-major alpha-sweep
path (one batched device dispatch per image, reference contract
aff_prepare.py:53-86) must produce every per-alpha output dir with
(21, H, W) score arrays whose argmax agrees with the exact native backend."""

import os

import numpy as np
import PIL.Image
import pytest


@pytest.fixture(scope="module")
def prepared_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    (root / "JPEGImages").mkdir()
    cam_dir = root / "cam"
    cam_dir.mkdir()
    rng = np.random.RandomState(0)
    names = ["2007_000201", "2007_000202"]
    hw = [(40, 56), (56, 40)]  # two shapes -> two mask buckets
    for name, (h, w) in zip(names, hw):
        img = np.zeros((h, w, 3), np.uint8)
        img[: h // 2] = (40, 90, 160)
        img[h // 2 :] = (200, 160, 60)
        img = np.clip(
            img.astype(np.int32) + rng.randint(-12, 12, img.shape), 0, 255
        ).astype(np.uint8)
        PIL.Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg")
        cam = np.zeros((h, w), np.float32)
        cam[: h // 2] = 0.9
        np.save(cam_dir / f"{name}.npy", {3: cam})
    (root / "list.txt").write_text("\n".join(names) + "\n")
    return root, names


def test_aff_prepare_tpu_backend_sweep(prepared_root, tmp_path):
    from wseg_tpu.cli.aff_prepare import main

    root, names = prepared_root
    out_tpu = tmp_path / "crf_tpu"
    main([
        "--infer_list", str(root / "list.txt"), "--voc12_root", str(root),
        "--cam_dir", str(root / "cam"), "--out_crf", str(out_tpu),
        "--crf_iters", "3", "--crf_backend", "tpu",
    ])
    out_nat = tmp_path / "crf_native"
    main([
        "--infer_list", str(root / "list.txt"), "--voc12_root", str(root),
        "--cam_dir", str(root / "cam"), "--out_crf", str(out_nat),
        "--crf_iters", "3", "--crf_backend", "native", "--num_workers", "2",
    ])

    alphas = ["4.00", "8.00", "16.00", "24.00", "32.00"]
    assert sorted(os.listdir(out_tpu)) == sorted(alphas)
    for alpha in alphas:
        for name in names:
            a = np.load(out_tpu / alpha / f"{name}.npy")
            b = np.load(out_nat / alpha / f"{name}.npy")
            h, w = np.load(root / "cam" / f"{name}.npy", allow_pickle=True).item()[3].shape
            assert a.shape == b.shape == (21, h, w)
            assert np.isfinite(a).all()
            agree = (a.argmax(0) == b.argmax(0)).mean()
            assert agree > 0.95, (alpha, name, agree)


def test_crf_from_cam_dict_backends_agree(prepared_root, tmp_path):
    """contrast_infer's CRF png path (crf_from_cam_dict, imutils
    parameterization sxy50/srgb5): tpu backend argmax must track the exact
    native lattice."""
    from PIL import Image

    from wseg_tpu.infer.crf_post import crf_from_cam_dict

    root, names = prepared_root
    name = names[0]
    cam_dict = np.load(root / "cam" / f"{name}.npy", allow_pickle=True).item()
    img_path = str(root / "JPEGImages" / f"{name}.jpg")
    outs = {}
    for backend in ("native", "tpu"):
        out = tmp_path / f"{backend}.png"
        pred = crf_from_cam_dict(cam_dict, img_path, str(out), t=3, backend=backend)
        assert (np.array(Image.open(out)) == pred).all()
        outs[backend] = pred
    assert outs["native"].shape == outs["tpu"].shape
    agree = (outs["native"] == outs["tpu"]).mean()
    assert agree > 0.95, agree
