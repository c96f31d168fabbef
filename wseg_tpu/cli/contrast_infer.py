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
    parser.add_argument("--bucket", default=64, type=int,
                        help="pad H/W to multiples for compile reuse; 0 = exact shapes")
    parser.add_argument("--device_msf", action="store_true",
                        help="whole-pipeline-on-device mode: uint8 image in, "
                        "device-side bicubic views + fusion (one compile per "
                        "image size)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
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

    dataset = VOC12ClsDatasetMSF(args.infer_list, args.voc12_root)
    inferencer = CamInferencer(
        model, variables, bucket=args.bucket or None, device_msf=args.device_msf
    )

    crf_pool = ThreadPoolExecutor(max_workers=args.num_workers)
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

    prep_pool = ThreadPoolExecutor(max_workers=4)
    pending = [prep_pool.submit(prepare, i) for i in range(min(4, len(dataset)))]

    for idx in range(len(dataset)):
        name, data, label, orig_hw = pending.pop(0).result()
        nxt = idx + len(pending) + 1
        if nxt < len(dataset):
            pending.append(prep_pool.submit(prepare, nxt))
        if args.device_msf:
            norm_cam = inferencer.infer_one_device(data, np.asarray(label))
        else:
            norm_cam = inferencer.infer_one(data, np.asarray(label), orig_hw)

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
                    t=args.crf_iters,
                )
            )

        if (idx + 1) % 50 == 0:
            timer.update_progress((idx + 1) / len(dataset))
            print(f"{idx + 1}/{len(dataset)} imgs, fin: {timer.str_est_finish()}", flush=True)

    for f in crf_futures:
        f.result()
    crf_pool.shutdown()
    prep_pool.shutdown()
    print("done")


if __name__ == "__main__":
    main()
