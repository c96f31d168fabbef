"""aff_prepare END-TO-END head-to-head: native C++ CRF vs TPU CRF backend
(VERDICT r3 item 4 — promote or consciously demote the TPU path).

Builds a synthetic corpus (jpgs + CAM .npy dicts at VOC-like sizes) and runs
the REAL `cli/aff_prepare.main` twice — once per backend — timing the whole
command (host IO + unary build + CRF + saves), i.e. exactly what a user's
wall clock sees for the full 5-alpha sweep. Also reports the per-image/alpha
argmax agreement between the two backends' outputs.

Run ON THE CHIP: python scripts/aff_prepare_headtohead.py [--n 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--work", default="/tmp/aff_prepare_h2h")
    p.add_argument("--iters", type=int, default=1)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from wseg_tpu.cli import aff_prepare

    shutil.rmtree(args.work, ignore_errors=True)
    root = os.path.join(args.work, "VOC2012")
    os.makedirs(os.path.join(root, "JPEGImages"))
    cam_dir = os.path.join(args.work, "cam")
    os.makedirs(cam_dir)
    rng = np.random.RandomState(0)
    sizes = [(384, 512), (384, 512), (375, 500), (333, 500)]
    names = []
    for i in range(args.n):
        h, w = sizes[i % len(sizes)]
        name = f"2012_{i:06d}"
        names.append(name)
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        # colored rectangle so the bilateral kernel has structure
        img[h // 4 : h // 2, w // 4 : w // 2] = (30, 200, 60)
        Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", name + ".jpg"), quality=95
        )
        cam = {1 + (i % 3): rng.rand(h, w).astype(np.float32)}
        np.save(os.path.join(cam_dir, name + ".npy"), cam)
    lst = os.path.join(args.work, "list.txt")
    open(lst, "w").write("".join(n + "\n" for n in names))

    results = {}
    for backend in ["tpu", "native"]:
        out_crf = os.path.join(args.work, f"crf_{backend}")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            aff_prepare.main([
                "--infer_list", lst, "--voc12_root", root,
                "--cam_dir", cam_dir, "--out_crf", out_crf,
                "--crf_backend", backend, "--num_workers", "8",
            ])
        dt = (time.perf_counter() - t0) / args.iters
        results[backend] = dt
        print(json.dumps({
            "backend": backend, "n_images": args.n, "alphas": 5,
            "wall_sec": round(dt, 2),
            "sec_per_image": round(dt / args.n, 3),
            "imgs_per_sec": round(args.n / dt, 2),
        }), flush=True)

    agree = []
    for name in names:
        for alpha in ("4.00", "8.00", "16.00", "24.00", "32.00"):
            a = np.load(os.path.join(args.work, "crf_native", alpha, name + ".npy"))
            b = np.load(os.path.join(args.work, "crf_tpu", alpha, name + ".npy"))
            agree.append(float((a.argmax(0) == b.argmax(0)).mean()))
    print(json.dumps({
        "argmax_agreement_min": round(min(agree), 4),
        "argmax_agreement_mean": round(sum(agree) / len(agree), 4),
        "speedup_tpu_over_native": round(results["native"] / results["tpu"], 2),
    }))


if __name__ == "__main__":
    main()
