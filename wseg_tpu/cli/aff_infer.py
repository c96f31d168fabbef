"""Random-walk CAM refinement CLI — flag-compatible rebuild of `aff_infer.py`.

Per image: load the CAM dict, fill bg=0.27, refine through the learned
affinity's T^(2^logt) transition matrix on TPU, write the argmax pseudo-mask
png (the stage-3 training labels).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True, type=str)
    parser.add_argument("--network", default="affinity", type=str)
    parser.add_argument("--infer_list", default="voc12/val.txt", type=str)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--cam_dir", required=True, type=str)
    parser.add_argument("--voc12_root", default="VOC2012", type=str)
    parser.add_argument("--alpha", default=6, type=float)  # kept for flag parity
    parser.add_argument("--out_rw", default="out_rw", type=str)
    parser.add_argument("--beta", default=8, type=int)
    parser.add_argument("--logt", default=6, type=int)
    parser.add_argument("--bg_score", default=0.27, type=float)
    parser.add_argument("--bucket", default=64, type=int)
    parser.add_argument("--batch_size", default=0, type=int,
                        help="images per refine_batch call; 0 = 96 per "
                        "device (the walk's dependent small-matmul chain is "
                        "latency-bound: measured 27 -> 90 -> 99 -> 115 -> "
                        "118 imgs/s at batch 1/16/32/64/96 on one chip, "
                        "ROOFLINE.md 5d). Names are pre-grouped by bucket "
                        "shape and each bucket's dispatch is capped at the "
                        "walk's pixel budget (96*384*512), so 512x512 "
                        "buckets run at 72 and nothing OOMs on mixed sizes. "
                        "With >1 local chip, batches also shard over a "
                        "data-parallel mesh (the reference refines one "
                        "image on one GPU at a time)")
    parser.add_argument("--walk_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="matrix-power chain dtype; bfloat16 halves the "
                        "walk's HBM traffic (argmax flip rate measured in "
                        "ROOFLINE.md 5d; float32 is reference parity)")
    args = parser.parse_args(argv)

    import imageio
    import jax
    import jax.numpy as jnp
    from wseg_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    from PIL import Image

    from wseg_tpu.data.transforms import Normalize
    from wseg_tpu.data.voc12 import get_img_path, load_img_name_list
    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import load_checkpoint, load_pretrained, merge_params
    from wseg_tpu.utils.logging import Timer

    os.makedirs(args.out_rw, exist_ok=True)

    model = build_model(args.network)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    if args.weights.endswith(".ckpt"):
        variables = load_checkpoint(args.weights, dict(variables))
    else:
        lp, ls = load_pretrained(args.weights)
        variables = {
            "params": merge_params(variables["params"], lp),
            "batch_stats": merge_params(variables["batch_stats"], ls),
        }

    n_devices = len(jax.devices())
    batch_size = args.batch_size or 96 * n_devices
    mesh = None
    if n_devices > 1:
        from wseg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"data-parallel refinement over {n_devices} chips, batch {batch_size}")
    refiner = RandomWalkRefiner(
        model, variables, beta=args.beta, logt=args.logt, bucket=args.bucket,
        mesh=mesh,
        walk_dtype=jnp.bfloat16 if args.walk_dtype == "bfloat16" else None,
    )
    normalize = Normalize()
    name_list = load_img_name_list(args.infer_list)
    timer = Timer("RW infer started: ")

    def load_item(name):
        img = np.array(Image.open(get_img_path(name, args.voc12_root)).convert("RGB"))
        h, w = img.shape[:2]
        cam_dict = np.load(
            os.path.join(args.cam_dir, name + ".npy"), allow_pickle=True
        ).item()
        cam_full = np.zeros((h, w, 21), np.float32)
        for k, v in cam_dict.items():
            cam_full[..., k + 1] = v
        cam_full[..., 0] = args.bg_score
        return normalize(img), cam_full

    if mesh is not None or batch_size > 1:
        from concurrent.futures import ThreadPoolExecutor

        from wseg_tpu.infer.rw import MAX_WALK_PX

        # Pre-scan image sizes from the JPEG headers (no pixel decode) and
        # group names by bucket shape: every device dispatch is then a full
        # constant-shape batch — maximal walk batching (the chain is
        # latency-bound, ROOFLINE.md 5d) and ONE compiled program per bucket
        # shape instead of one per group-fill size (remote compiles take
        # minutes). Each bucket's chunk size is capped by the walk's pixel
        # budget so large buckets cannot OOM.
        mult = args.bucket or 8
        shape_groups: dict[tuple[int, int], list[str]] = {}
        for name in name_list:
            with Image.open(get_img_path(name, args.voc12_root)) as im:
                w, h = im.size
            key = (-(-h // mult) * mult, -(-w // mult) * mult)
            shape_groups.setdefault(key, []).append(name)

        chunks = []
        for (ph, pw), names in shape_groups.items():
            bmax = max(
                n_devices, MAX_WALK_PX // (ph * pw) // n_devices * n_devices
            )
            bs = min(max(batch_size, 1), bmax)
            chunks += [names[s : s + bs] for s in range(0, len(names), bs)]
        # overlap next-chunk host prep (JPEG decode + cam load) with device
        # compute, like contrast_infer's prefetch pool
        pool = ThreadPoolExecutor(max_workers=max(min(args.num_workers, 4), 1))

        def load_chunk(c):
            return [load_item(n) for n in c]

        fut = pool.submit(load_chunk, chunks[0]) if chunks else None
        done = 0
        for ci, chunk in enumerate(chunks):
            items = fut.result()
            if ci + 1 < len(chunks):
                fut = pool.submit(load_chunk, chunks[ci + 1])
            preds = refiner.refine_batch(items)
            for name, pred in zip(chunk, preds):
                imageio.imwrite(os.path.join(args.out_rw, name + ".png"), pred)
            prev, done = done, done + len(chunk)
            # progress whenever a 50-image boundary is crossed (= every
            # chunk once chunks exceed 50 images)
            if done // 50 > prev // 50 or done == len(name_list):
                timer.update_progress(done / len(name_list))
                print(f"{done}/{len(name_list)}, fin: {timer.str_est_finish()}", flush=True)
        pool.shutdown()
    else:
        for idx, name in enumerate(name_list):
            img, cam_full = load_item(name)
            pred = refiner.refine_one(img, cam_full)
            imageio.imwrite(os.path.join(args.out_rw, name + ".png"), pred)

            if (idx + 1) % 50 == 0:
                timer.update_progress((idx + 1) / len(name_list))
                print(f"{idx + 1}/{len(name_list)}, fin: {timer.str_est_finish()}", flush=True)

    print("done")


if __name__ == "__main__":
    main()
