"""Kill-and-resume EQUIVALENCE for the stage-1 train CLI (VERDICT r3 item 7,
CPU half; scripts/soak_stage1.py runs the same protocol at the real 8-epoch
scale on the chip).

The guarantee under test: a run killed after epoch k and continued with
`--resume <ckpt> --start_epoch k+1` produces BIT-IDENTICAL final parameters
to the uninterrupted run. This requires the whole input pipeline to be a
pure function of (seed, epoch, index) — epoch-indexed shuffle
(DataLoader.set_epoch), per-sample augmentation rng
(ContrastTrainDataset det_seed), and the jax rng + optimizer step carried in
the checkpointed TrainState."""

import os

import numpy as np
import pytest

from test_e2e_learning import _make_planted_voc


def _final_params(ckpt_path):
    from wseg_tpu.utils.checkpoint import load_checkpoint

    loaded = load_checkpoint(ckpt_path, None)
    return loaded["params"]


def _run(tmp_path, session, root, train_list, base_ckpt, epochs, extra):
    from wseg_tpu.cli import contrast_train

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        contrast_train.main([
            "--train_list", train_list, "--voc12_root", root,
            "--weights", base_ckpt,
            "--batch_size", "4", "--max_epoches", str(epochs),
            "--crop_size", "64", "--low_res", "32",
            "--min_long", "64", "--max_long", "80",
            "--num_workers", "2", "--session_name", session,
            "--tblog_dir", str(tmp_path / "tblog" / session),
            "--lr", "0.01", "--grad_clip", "5.0", "--momentum", "0.9",
        ] + extra)
    finally:
        os.chdir(cwd)
    return str(tmp_path / "result" / session / "contrast.ckpt")


@pytest.mark.slow
def test_killed_and_resumed_run_equals_uninterrupted(tmp_path):
    import jax
    import jax.numpy as jnp

    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import save_checkpoint

    root, train_list, _, _, _ = _make_planted_voc(
        tmp_path, n_train=8, n_eval=0, size=64
    )
    model = build_model("contrast")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    base_ckpt = str(tmp_path / "base.ckpt")
    save_checkpoint(base_ckpt, variables)

    # A: 4 epochs uninterrupted
    full = _run(tmp_path, "full", root, train_list, base_ckpt, 4, [])

    # B: "killed" after epoch 2 of the SAME 4-epoch schedule (the poly-lr
    # max_step must match the full run's, so --max_epoches stays 4 and
    # --stop_after_epoch emulates the kill), then resumed for the rest
    _run(tmp_path, "part", root, train_list, base_ckpt, 4,
         ["--save_every_epoch", "--stop_after_epoch", "2"])
    ep_ckpt = str(tmp_path / "result" / "part" / "contrast_train.ckpt")
    assert os.path.exists(ep_ckpt)
    assert not os.path.exists(
        str(tmp_path / "result" / "part" / "contrast.ckpt")
    )  # the kill really prevented the final save
    resumed = _run(
        tmp_path, "part", root, train_list, base_ckpt, 4,
        ["--resume", ep_ckpt, "--start_epoch", "2"],
    )
    p_full = _final_params(full)
    p_res = _final_params(resumed)
    leaves_f = jax.tree.leaves(p_full)
    leaves_r = jax.tree.leaves(p_res)
    assert len(leaves_f) == len(leaves_r)
    for a, b in zip(leaves_f, leaves_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _run_aff(tmp_path, session, root, train_list, la, ha, epochs, extra):
    from wseg_tpu.cli import aff_train

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        aff_train.main([
            "--train_list", train_list, "--voc12_root", root,
            "--la_crf_dir", la, "--ha_crf_dir", ha,
            "--batch_size", "4", "--max_epoches", str(epochs),
            "--crop_size", "64", "--num_workers", "2",
            "--session_name", session, "--momentum", "0.9",
        ] + extra)
    finally:
        os.chdir(cwd)
    return str(tmp_path / "result" / session / "aff.ckpt")


@pytest.mark.slow
def test_aff_train_killed_and_resumed_equals_uninterrupted(tmp_path):
    import jax

    root, train_list, _, _, names = _make_planted_voc(
        tmp_path, n_train=8, n_eval=0, size=64
    )
    # synthetic la/ha CRF score arrays ((21, h, w), the aff_prepare contract)
    rng = np.random.RandomState(3)
    la = tmp_path / "la"
    ha = tmp_path / "ha"
    la.mkdir()
    ha.mkdir()
    for n in names[:8]:
        np.save(la / f"{n}.npy", rng.rand(21, 64, 64).astype(np.float32))
        np.save(ha / f"{n}.npy", rng.rand(21, 64, 64).astype(np.float32))

    full = _run_aff(tmp_path, "afull", root, train_list, str(la), str(ha), 3, [])
    _run_aff(tmp_path, "apart", root, train_list, str(la), str(ha), 3,
             ["--save_every_epoch", "--stop_after_epoch", "1"])
    ep_ckpt = str(tmp_path / "result" / "apart" / "aff_train.ckpt")
    assert os.path.exists(ep_ckpt)
    resumed = _run_aff(tmp_path, "apart", root, train_list, str(la), str(ha), 3,
                       ["--resume", ep_ckpt, "--start_epoch", "1"])

    pf, pr = _final_params(full), _final_params(resumed)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_seg_train_killed_and_resumed_equals_uninterrupted(tmp_path):
    import jax
    from PIL import Image

    from wseg_tpu.cli import seg_train

    root, _, _, gt_dir, names = _make_planted_voc(
        tmp_path, n_train=8, n_eval=0, size=64
    )
    seg_root = tmp_path / "segVOC"
    (seg_root / "JPEGImages").mkdir(parents=True)
    (seg_root / "SegmentationClass").mkdir()
    (seg_root / "ImageSets" / "Segmentation").mkdir(parents=True)
    for n in names:
        os.link(os.path.join(root, "JPEGImages", n + ".jpg"),
                seg_root / "JPEGImages" / f"{n}.jpg")
        os.link(os.path.join(gt_dir, n + ".png"),
                seg_root / "SegmentationClass" / f"{n}.png")
    (seg_root / "ImageSets" / "Segmentation" / "trainaug.txt").write_text(
        "\n".join(names) + "\n"
    )

    def run(session, extra):
        rundir = tmp_path / session
        rundir.mkdir(exist_ok=True)
        cwd = os.getcwd()
        os.chdir(rundir)
        try:
            seg_train.main([
                "--exp", "SEAM_deeplabv1_resnet38", "--data_root", str(seg_root),
                "--pseudo_gt", str(seg_root / "SegmentationClass"),
                "--iterations", "6", "--batch_size", "4", "--crop", "64",
                "--bn_mom", "0.1",
            ] + extra)
        finally:
            os.chdir(cwd)
        return str(rundir / "model" / "SEAM_deeplabv1_resnet38" /
                   "deeplabv1_resnet38_VOCDataset_itr6_all.ckpt")

    # 6 iterations at 2 steps/epoch = 3 epochs; kill after epoch 1
    full = run("sfull", [])
    run("spart", ["--save_state", "--stop_after_epoch", "1"])
    st = str(tmp_path / "spart" / "model" / "SEAM_deeplabv1_resnet38" /
             "seg_train_state.ckpt")
    assert os.path.exists(st)
    resumed = run("spart", ["--resume", st, "--min_epoch", "1"])

    pf, pr = _final_params(full), _final_params(resumed)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
