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
