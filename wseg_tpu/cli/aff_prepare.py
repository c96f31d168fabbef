"""Build low/high-alpha CRF pseudo labels for AffinityNet training —
flag-compatible rebuild of `aff_prepare.py`.

Fixes the reference's latent bug where every alpha in alpha_list was run with
`args.alpha` (aff_prepare.py:76-81): here each alpha in the list actually
produces its own output dir (pass --alpha to run a single value instead).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--infer_list", default="voc12/train_aug.txt", type=str)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--voc12_root", default="VOC2012", type=str)
    parser.add_argument("--cam_dir", required=True, type=str)
    parser.add_argument("--out_crf", required=True, type=str)
    parser.add_argument("--crf_iters", default=10, type=int)
    parser.add_argument("--alpha", default=None, type=float,
                        help="single alpha; default runs the [4,8,16,24,32] sweep")
    parser.add_argument("--crf_backend", default="native", choices=["native", "tpu"],
                        help="native = exact C++ permutohedral; tpu = jitted "
                        "low-rank (Nystrom color x SVD spatial) CRF")
    args = parser.parse_args(argv)

    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    from wseg_tpu.data.voc12 import get_img_path, load_img_name_list
    from wseg_tpu.infer.crf_post import crf_with_alpha_sweep

    name_list = load_img_name_list(args.infer_list)
    alpha_list = [args.alpha] if args.alpha is not None else [4, 8, 16, 24, 32]

    folders = {}
    for alpha in alpha_list:
        folders[alpha] = os.path.join(args.out_crf, "%.2f" % alpha)
        os.makedirs(folders[alpha], exist_ok=True)

    # Image-major on BOTH backends: each image runs its whole alpha sweep at
    # once, because the expensive per-image state depends only on the image
    # and is shared across alphas — the permutohedral lattice builds on the
    # native path (one init instead of five; bit-identical outputs), the
    # Nystrom color features on the tpu path (one device dispatch, bucketed
    # shape padding keeps the compile count to a handful of bucket programs).
    # The reference runs one full corpus pass PER alpha (aff_prepare.py:76-86).
    if args.crf_backend == "tpu":
        from wseg_tpu.utils.jaxsetup import enable_compilation_cache

        enable_compilation_cache()
        # A few threads pipeline the host side: while one image's
        # (A, 21, H, W) result downloads / saves, another thread loads and
        # dispatches the next — device compute serializes in-stream either
        # way. Worker count stays small to bound host memory (~80 MB of
        # scores in flight per image).
        workers = max(min(4, args.num_workers), 1)
    else:
        # the native C++ path releases the GIL and fans out across threads
        workers = max(args.num_workers, 1)

    def work(name):
        cam_dict = np.load(
            os.path.join(args.cam_dir, name + ".npy"), allow_pickle=True
        ).item()
        crfs = crf_with_alpha_sweep(
            cam_dict, get_img_path(name, args.voc12_root), alpha_list,
            t=args.crf_iters, backend=args.crf_backend,
        )
        for alpha, crf in zip(alpha_list, crfs):
            np.save(os.path.join(folders[alpha], name + ".npy"), crf)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(work, name_list))
    for alpha in alpha_list:
        print(f"Info: Alpha {alpha} done!", flush=True)


if __name__ == "__main__":
    main()
