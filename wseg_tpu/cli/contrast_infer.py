"""MSF+flip CAM inference CLI — flag-compatible rebuild of `contrast_infer.py`.

Writes (per image): `--out_cam` {cls: cam}.npy dicts, `--out_cam_pred` argmax
pngs with bg alpha, `--out_crf` label-unary dense-CRF pngs.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True, type=str)
    parser.add_argument("--network", default="contrast", type=str)
    parser.add_argument("--infer_list", default="voc12/train.txt", type=str)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--voc12_root", default="VOC2012", type=str)
    parser.add_argument("--out_cam", default=None, type=str)
    parser.add_argument("--out_crf", default=None, type=str)
    parser.add_argument("--out_cam_pred", default=None, type=str)
    parser.add_argument("--out_cam_pred_alpha", default=0.26, type=float)
    parser.add_argument("--crf_iters", default=10, type=int)
    parser.add_argument("--crf_backend", default="native", choices=["native", "tpu"],
                        help="native = exact C++ permutohedral; tpu = jitted "
                        "low-rank (Nystrom color x SVD spatial) CRF on device")
    parser.add_argument("--bucket", default=64, type=int,
                        help="pad H/W to multiples for compile reuse; 0 = exact shapes")
    parser.add_argument("--device_msf", action="store_true",
                        help="whole-pipeline-on-device mode: uint8 image in, "
                        "device-side bicubic views + fusion (one compile per "
                        "image size)")
    parser.add_argument("--batch_size", default=0, type=int,
                        help="images per data-parallel batch sharded over all "
                        "chips (0 = one per chip; single-image path on one "
                        "chip). Replaces the reference's thread pool over GPU "
                        "replicas (contrast_infer.py:46-71). Batches up to 32 "
                        "per chip are safe: big-scale dispatches are chunked "
                        "to a measured pixel cap (infer/cam.py MAX_VIEW_PX)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from wseg_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor

    from wseg_tpu.data.voc12 import VOC12ClsDatasetMSF, get_img_path
    from wseg_tpu.infer.cam import CamInferencer, save_cam_dict, save_cam_pred
    from wseg_tpu.models import build_model
    from wseg_tpu.utils.checkpoint import load_checkpoint, load_pretrained, merge_params
    from wseg_tpu.utils.logging import Timer

    model = build_model(args.network)
    variables = model.init(
        __import__("jax").random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    if args.weights.endswith(".ckpt"):
        variables = load_checkpoint(args.weights, variables)
    else:
        loaded_params, loaded_stats = load_pretrained(args.weights)
        variables = {
            "params": merge_params(variables["params"], loaded_params),
            "batch_stats": merge_params(variables["batch_stats"], loaded_stats),
        }

    import jax

    n_devices = len(jax.devices())
    batch_size = args.batch_size or n_devices
    mesh = None
    if n_devices > 1 and not args.device_msf:
        from wseg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"data-parallel inference over {n_devices} chips, batch {batch_size}")

    dataset = VOC12ClsDatasetMSF(args.infer_list, args.voc12_root)
    inferencer = CamInferencer(
        model, variables, bucket=args.bucket or None, device_msf=args.device_msf,
        mesh=mesh,
    )
    use_batched = batch_size > 1 or mesh is not None
    batched_loop = use_batched and not args.device_msf  # device_msf is per-image

    # the native C++ CRF releases the GIL and fans out across threads; the
    # tpu backend's dispatches serialize on the one device, so one worker
    # suffices (it still overlaps host png writes with device compute)
    crf_pool = ThreadPoolExecutor(
        max_workers=1 if args.crf_backend == "tpu" else args.num_workers
    )
    crf_futures = []
    timer = Timer("Infer started: ")

    # pipeline host-side decode/augment with device compute (the reference
    # overlaps via DataLoader worker processes; a thread prefetch suffices
    # since PIL releases the GIL)
    def prepare(idx):
        if args.device_msf:
            name = dataset.img_name_list[idx]
            from PIL import Image as _Image

            img = np.array(
                _Image.open(get_img_path(name, args.voc12_root)).convert("RGB")
            )
            return name, img, dataset.label_list[idx], None
        name, views, label, orig_hw = dataset[idx]
        return name, views, label, orig_hw

    def write_outputs(name, norm_cam, label):
        if args.out_cam is not None:
            cam_dict = save_cam_dict(args.out_cam, name, norm_cam, label)
        else:
            cam_dict = {i: norm_cam[i] for i in range(20) if label[i] > 1e-5}

        if args.out_cam_pred is not None:
            save_cam_pred(args.out_cam_pred, name, norm_cam, args.out_cam_pred_alpha)

        if args.out_crf is not None:
            from wseg_tpu.infer.crf_post import crf_from_cam_dict

            img_path = get_img_path(name, args.voc12_root)
            crf_futures.append(
                crf_pool.submit(
                    crf_from_cam_dict, cam_dict, img_path,
                    os.path.join(args.out_crf, name + ".png"),
                    t=args.crf_iters, backend=args.crf_backend,
                )
            )

    def progress(done):
        if done % 50 < (batch_size if batched_loop else 1):
            timer.update_progress(done / len(dataset))
            print(f"{done}/{len(dataset)} imgs, fin: {timer.str_est_finish()}", flush=True)

    prep_pool = ThreadPoolExecutor(max_workers=4)
    prefetch = max(4, batch_size)
    pending = [prep_pool.submit(prepare, i) for i in range(min(prefetch, len(dataset)))]

    def next_item(idx):
        item = pending.pop(0).result()
        nxt = idx + len(pending) + 1
        if nxt < len(dataset):
            pending.append(prep_pool.submit(prepare, nxt))
        return item

    if batched_loop:
        idx = 0
        while idx < len(dataset):
            chunk = [next_item(idx + k)
                     for k in range(min(batch_size, len(dataset) - idx))]
            idx += len(chunk)
            cams = inferencer.infer_batch(
                [(views, np.asarray(label), orig_hw)
                 for (_, views, label, orig_hw) in chunk]
            )
            for (name, _, label, _), norm_cam in zip(chunk, cams):
                write_outputs(name, norm_cam, label)
            progress(idx)
    else:
        for idx in range(len(dataset)):
            name, data, label, orig_hw = next_item(idx)
            if args.device_msf:
                norm_cam = inferencer.infer_one_device(data, np.asarray(label))
            else:
                norm_cam = inferencer.infer_one(data, np.asarray(label), orig_hw)
            write_outputs(name, norm_cam, label)
            progress(idx + 1)

    for f in crf_futures:
        f.result()
    crf_pool.shutdown()
    prep_pool.shutdown()
    print("done")


if __name__ == "__main__":
    main()
