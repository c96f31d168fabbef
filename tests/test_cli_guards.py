"""CLI misuse guards (ADVICE r4): flag combinations that would silently train
wrong must fail fast, BEFORE any model/dataset construction.

* --start_epoch > 0 without --resume (contrast_train, aff_train) and
  --min_epoch > 0 without --resume/--train_ckpt (seg_train) would skip epochs
  and train from init weights with a misleading global_step/lr printout.
* reproduce --stages with unknown tokens ('1-3', '4') would silently run
  nothing (or a partial chain) and still print 'reproduce chain complete'.
"""

import pytest

from wseg_tpu.cli import aff_train, contrast_train, reproduce, seg_train


def test_contrast_train_start_epoch_requires_resume():
    with pytest.raises(SystemExit, match="start_epoch"):
        contrast_train.main(["--start_epoch", "2"])


def test_aff_train_start_epoch_requires_resume():
    with pytest.raises(SystemExit, match="start_epoch"):
        aff_train.main([
            "--start_epoch", "1", "--la_crf_dir", "x", "--ha_crf_dir", "y",
        ])


def test_seg_train_min_epoch_requires_resume():
    with pytest.raises(SystemExit, match="min_epoch"):
        seg_train.main(["--min_epoch", "3"])


@pytest.mark.parametrize("bad", ["1-3", "4", "1,,4", ""])
def test_reproduce_rejects_unknown_stage_tokens(bad, tmp_path):
    with pytest.raises(SystemExit, match="stages"):
        reproduce.main([
            "--voc12_root", str(tmp_path), "--weights", str(tmp_path / "w"),
            "--work", str(tmp_path / "work"), "--stages", bad,
        ])
