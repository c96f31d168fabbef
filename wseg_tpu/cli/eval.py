"""Seed / pseudo-mask evaluation CLI — flag-compatible rebuild of `eval.py`."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--list", default="./VOC2012/ImageSets/Segmentation/train.txt", type=str)
    parser.add_argument("--predict_dir", default="./out_rw", type=str)
    parser.add_argument("--gt_dir", default="./VOC2012/SegmentationClass", type=str)
    parser.add_argument("--logfile", default="./evallog.txt", type=str)
    parser.add_argument("--comment", required=True, type=str)
    parser.add_argument("--type", default="png", choices=["npy", "png"], type=str)
    parser.add_argument("--t", default=None, type=float)
    parser.add_argument("--curve", default=False, type=bool)
    args = parser.parse_args(argv)

    from wseg_tpu.eval.miou import evaluate_dir
    from wseg_tpu.utils.logging import writelog

    if args.type == "npy":
        assert args.t is not None or args.curve

    name_list = [l.strip() for l in open(args.list).read().splitlines() if l.strip()]
    loglist = evaluate_dir(
        args.predict_dir, args.gt_dir, name_list,
        input_type=args.type, threshold=args.t, curve=args.curve,
    )
    writelog(args.logfile, loglist, args.comment)


if __name__ == "__main__":
    main()
