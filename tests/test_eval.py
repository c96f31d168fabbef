"""mIoU evaluator tests: png mode, npy mode, curve sweep consistency."""

import numpy as np
import PIL.Image
import pytest

from wseg_tpu.eval.miou import do_python_eval, evaluate_dir


@pytest.fixture()
def eval_dirs(tmp_path):
    gt_dir = tmp_path / "gt"
    npy_dir = tmp_path / "npy"
    png_dir = tmp_path / "png"
    for d in (gt_dir, npy_dir, png_dir):
        d.mkdir()
    rng = np.random.RandomState(0)
    names = ["a", "b"]
    for name in names:
        gt = rng.randint(0, 4, (20, 24)).astype(np.uint8)
        gt[:2, :2] = 255
        PIL.Image.fromarray(gt).save(gt_dir / f"{name}.png")
        cam = {}
        for cls in range(3):
            cam[cls] = rng.rand(20, 24).astype(np.float32)
        np.save(npy_dir / f"{name}.npy", cam)
        tensor = np.zeros((21, 20, 24), np.float32)
        for k, v in cam.items():
            tensor[k + 1] = v
        tensor[0] = 0.3
        PIL.Image.fromarray(np.argmax(tensor, 0).astype(np.uint8)).save(
            png_dir / f"{name}.png"
        )
    return names, gt_dir, npy_dir, png_dir


def test_png_and_npy_modes_agree(eval_dirs):
    names, gt_dir, npy_dir, png_dir = eval_dirs
    log_png = do_python_eval(str(png_dir), str(gt_dir), names, input_type="png")
    log_npy = do_python_eval(
        str(npy_dir), str(gt_dir), names, input_type="npy", threshold=0.3
    )
    np.testing.assert_allclose(log_png["mIoU"], log_npy["mIoU"], rtol=1e-9)


def test_curve_matches_per_threshold(eval_dirs, capsys):
    names, gt_dir, npy_dir, _ = eval_dirs
    curve = evaluate_dir(str(npy_dir), str(gt_dir), names, input_type="npy", curve=True)
    for i in (0, 17, 42):
        t = i / 100.0
        single = do_python_eval(
            str(npy_dir), str(gt_dir), names, input_type="npy", threshold=t
        )
        np.testing.assert_allclose(curve["mIoU"][i], single["mIoU"], rtol=1e-9)
