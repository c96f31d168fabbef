"""Generate the image-level multi-hot label dict (cls_labels.npy) from the
VOC XML annotations — rebuild of `voc12/make_cls_labels.py` (which imports a
stale package path and crashes as-is, SURVEY.md §9)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_list", default="voc12/train_aug.txt")
    parser.add_argument("--val_list", default="voc12/val.txt")
    parser.add_argument("--out", default="voc12/cls_labels.npy")
    parser.add_argument("--voc12_root", required=True)
    args = parser.parse_args(argv)

    import numpy as np

    from wseg_tpu.data.voc12 import load_image_label_from_xml, load_img_name_list

    names = list(
        dict.fromkeys(
            load_img_name_list(args.train_list) + load_img_name_list(args.val_list)
        )
    )
    d = {}
    for name in names:
        d[name] = load_image_label_from_xml(name, args.voc12_root)
    np.save(args.out, d)
    print(f"saved {len(d)} labels to {args.out}")


if __name__ == "__main__":
    main()
