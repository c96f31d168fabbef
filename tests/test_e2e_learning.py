"""End-to-end LEARNING signal: plant a color<->class correlation in a
synthetic VOC root, run real `contrast_train` steps through the CLI, run the
real infer+eval path, and assert the seed mIoU improves substantially over
the random-init baseline (VERDICT r1 next-round #7 — the closest attainable
proxy for the 61.5 train-seed target without the real dataset)."""

import os

import numpy as np
import pytest

# class color planting: (VOC category name, fg class index (1-based in seg
# masks), RGB). bird=2, cat=7, dog=11 in the 20-class list.
_CLASSES = [("bird", 3, (40, 40, 220)), ("cat", 8, (40, 220, 40)),
            ("dog", 12, (220, 40, 40))]


def _make_planted_voc(tmp_path, n_train=24, n_eval=6, size=64, seed=0):
    from PIL import Image

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.RandomState(seed)

    names = []
    for i in range(n_train + n_eval):
        cat, cls_idx, color = _CLASSES[i % len(_CLASSES)]
        img = rng.randint(100, 140, (size, size, 3)).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        # one solid colored rectangle per image
        h = rng.randint(size // 3, size * 2 // 3)
        w = rng.randint(size // 3, size * 2 // 3)
        y = rng.randint(0, size - h)
        x = rng.randint(0, size - w)
        img[y : y + h, x : x + w] = np.array(color) + rng.randint(
            -10, 10, (h, w, 3)
        )
        mask[y : y + h, x : x + w] = cls_idx
        name = f"2012_{i:06d}"
        names.append(name)
        Image.fromarray(img).save(root / "JPEGImages" / f"{name}.jpg", quality=95)
        (root / "Annotations" / f"{name}.xml").write_text(
            f"<annotation><object><name>{cat}</name></object></annotation>"
        )
        Image.fromarray(mask).save(gt_dir / f"{name}.png")

    train_list = tmp_path / "train.txt"
    train_list.write_text("".join(n + "\n" for n in names[:n_train]))
    eval_list = tmp_path / "eval.txt"
    eval_list.write_text("".join(n + "\n" for n in names[n_train:]))
    return str(root), str(train_list), str(eval_list), str(gt_dir), names[n_train:]


def _seed_miou(model_ckpt, infer_list, root, gt_dir, out_dir):
    """Real infer (MSF+flip, bucketed, .npy cam dicts) + real eval with the
    bg-threshold curve sweep — how the reference reports its seed numbers
    (61.5 is a best-threshold figure, eval.py --curve)."""
    import contextlib
    import io

    from wseg_tpu.cli import contrast_infer
    from wseg_tpu.data.voc12 import load_img_name_list
    from wseg_tpu.eval.miou import evaluate_dir

    cam_dir = os.path.join(out_dir, "cam")
    contrast_infer.main([
        "--weights", model_ckpt, "--infer_list", infer_list,
        "--voc12_root", root, "--out_cam", cam_dir,
        "--num_workers", "2", "--batch_size", "8",
    ])
    with contextlib.redirect_stdout(io.StringIO()):
        res = evaluate_dir(
            cam_dir, gt_dir, load_img_name_list(infer_list),
            input_type="npy", curve=True, num_workers=2,
        )
    return max(res["mIoU"])


@pytest.mark.slow
@pytest.mark.learn
def test_contrast_train_learns_planted_correlation(tmp_path):
    import jax
    import jax.numpy as jnp

    from wseg_tpu.cli import contrast_train
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import save_checkpoint

    root, train_list, eval_list, gt_dir, _ = _make_planted_voc(tmp_path)

    # random-init baseline checkpoint
    model = build_model("contrast")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    base_ckpt = str(tmp_path / "base.ckpt")
    save_checkpoint(base_ckpt, variables)

    session = "e2e_learn"
    cwd = os.getcwd()
    os.chdir(tmp_path)  # train CLI writes result/<session>/
    try:
        contrast_train.main([
            "--train_list", train_list, "--voc12_root", root,
            "--weights", base_ckpt,
            "--batch_size", "4", "--max_epoches", "16",
            "--crop_size", "64", "--low_res", "32",
            "--min_long", "64", "--max_long", "80",
            "--num_workers", "2", "--session_name", session,
            "--tblog_dir", str(tmp_path / "tblog"),
            # training from RANDOM init (the reference always starts from
            # ImageNet weights): the x10-lr head groups atop the unnormalized
            # 4096-ch trunk diverge to NaN in ~2 steps without clipping
            # (measured: loss_cls 58 -> 2e18 -> nan at lr 0.05), and the
            # reference's accidental momentum=5e-4 (positional-arg quirk,
            # train/optim.py) learns too slowly for ~100 steps — use the
            # fixed-momentum variant the CLI exposes
            "--lr", "0.02", "--grad_clip", "5.0", "--momentum", "0.9",
        ])
        trained_ckpt = str(tmp_path / "result" / session / "contrast.ckpt")
        assert os.path.exists(trained_ckpt)
    finally:
        os.chdir(cwd)

    miou_base = _seed_miou(base_ckpt, eval_list, root, gt_dir, str(tmp_path / "b"))
    miou_trained = _seed_miou(
        trained_ckpt, eval_list, root, gt_dir, str(tmp_path / "t")
    )
    print(f"seed mIoU: random-init {miou_base:.2f} -> trained {miou_trained:.2f}")
    # Calibration: the eval averages IoU over all 21 classes with absent
    # classes scoring 0 (reference-identical, eval.py:75-96), so with
    # {bg, bird, cat, dog} present the ceiling is 4/21 = 19.05. Measured on
    # this config: random-init 5.28 -> trained 13.8-14.6 (i.e. ~75% mean IoU
    # over the present classes after 96 from-scratch steps).
    assert miou_trained > miou_base + 5.0, (miou_base, miou_trained)
    assert miou_trained > 10.0, miou_trained
