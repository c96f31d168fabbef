"""Smoke test for the turnkey quality-reproduction runbook
(`wseg_tpu/cli/reproduce.py`, VERDICT r3 item 6): the WHOLE documented chain
— contrast_train -> contrast_infer -> seed eval -> aff_prepare -> aff_train
-> aff_infer -> walk eval -> pseudo masks -> seg_train -> seg_test — executed
tiny on a synthetic planted root, through the same driver a user with the
real VOC2012 dataset would run unmodified.

Each stage runs as a REAL subprocess (the driver's production execution
model); WSEG_PLATFORM=cpu forces the children off the TPU (the sitecustomize
pre-empts JAX_PLATFORMS, see wseg_tpu/utils/jaxsetup.py)."""

import os
import shutil

import numpy as np
import pytest

from test_e2e_learning import _make_planted_voc


@pytest.mark.slow
@pytest.mark.learn
def test_reproduce_chain_runs_end_to_end(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from wseg_tpu.cli import reproduce
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import save_checkpoint

    root, train_list, eval_list, gt_dir, names = _make_planted_voc(
        tmp_path, n_train=8, n_eval=4, size=64
    )
    # the runbook evaluates against the standard in-root layout, and stage 3
    # reads the standard ImageSets lists (trainaug for training on pseudo
    # GT, val for the final table) — real VOC2012 ships these
    seg_class = os.path.join(root, "SegmentationClass")
    shutil.copytree(gt_dir, seg_class)
    sets = os.path.join(root, "ImageSets", "Segmentation")
    os.makedirs(sets)
    open(os.path.join(sets, "trainaug.txt"), "w").write(
        "".join(n + "\n" for n in names[:8])
    )
    open(os.path.join(sets, "val.txt"), "w").write(
        "".join(n + "\n" for n in names[8:])
    )

    # stand-in for the ImageNet-pretrained .params: a random-init stage-1
    # checkpoint (strict=False merge feeds all three stages, as the real
    # pretrained file would)
    model = build_model("contrast")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    weights = str(tmp_path / "pretrained.ckpt")
    save_checkpoint(weights, v)

    monkeypatch.setenv("WSEG_PLATFORM", "cpu")
    work = str(tmp_path / "work")
    reproduce.main([
        "--voc12_root", root, "--weights", weights, "--work", work,
        "--train_list", train_list, "--eval_list", train_list,
        "--epochs", "1", "--batch_size", "4", "--crop_size", "64",
        "--low_res", "32", "--min_long", "64", "--max_long", "64",
        "--num_workers", "2", "--grad_clip", "5.0", "--alphas", "4,24",
        "--seg_iterations", "4", "--seg_batch_size", "4", "--seg_crop", "64",
        "--seg_bn_mom", "0.1",
    ])

    # stage-boundary file contracts all materialized
    evallog = os.path.join(work, "evallog.txt")
    assert os.path.exists(evallog)
    log = open(evallog).read()
    assert "seed" in log and "rw" in log and "mIoU" in log

    some = names[0]
    cam = np.load(
        os.path.join(work, "cam", some + ".npy"), allow_pickle=True
    ).item()
    assert all(isinstance(k, (int, np.integer)) for k in cam)
    for sub in ("4.00", "24.00"):
        assert os.path.exists(os.path.join(work, "crf", sub, some + ".npy"))
    for d in ("rw", "pseudo"):
        assert os.path.exists(os.path.join(work, d, some + ".png"))
    assert os.path.exists(
        os.path.join(work, "result", "contrast", "contrast.ckpt")
    )
    assert os.path.exists(os.path.join(work, "result", "aff", "aff.ckpt"))
    seg_ckpt = os.path.join(
        work, "model", "SEAM_deeplabv1_resnet38",
        "deeplabv1_resnet38_VOCDataset_itr4_all.ckpt",
    )
    assert os.path.exists(seg_ckpt)
    # seg_test wrote its mIoU table
    seg_log_dir = os.path.join(work, "log", "SEAM_deeplabv1_resnet38")
    assert os.path.isdir(seg_log_dir) and os.listdir(seg_log_dir)
