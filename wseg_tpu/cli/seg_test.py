"""Stage-3 DeepLab testing CLI: multi-scale + flip TTA, optional dense CRF,
mIoU eval — rebuild of `segmentation/experiment/*/test.py:40-113`.

The reference's SEAM/EPS-deeplabv1 test scripts import a nonexistent
`dense_crf_from_deeplabv2` and crash (test.py:28,100 — SURVEY.md §9); here
the deeplabv2-style softmax-unary CRF is actually provided
(ops/densecrf.crf_inference_softmax).
"""

from __future__ import annotations

import argparse
import functools
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="SEAM_deeplabv1_resnet38")
    parser.add_argument("--data_root", default="VOC2012")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--period", default="val")
    parser.add_argument("--no_crf", action="store_true")
    parser.add_argument("--bucket", type=int, default=64)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.ops.densecrf import crf_inference_softmax
    from wseg_tpu.ops.resize import _resize_weights_np
    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.dataset import generate_dataset
    from wseg_tpu.seg.deeplab import generate_net
    from wseg_tpu.utils.checkpoint import load_checkpoint
    from wseg_tpu.utils.logging import Timer, writelog

    cfg = EXPERIMENTS[args.exp].replace(DATA_ROOT=args.data_root, TEST_CKPT=args.ckpt)
    if args.no_crf:
        cfg = cfg.replace(TEST_CRF=False)

    dataset = generate_dataset(cfg, period=args.period, transform="none")
    model = generate_net(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = load_checkpoint(args.ckpt, dict(variables))
    print(f"loaded {args.ckpt}")

    @functools.lru_cache(maxsize=None)
    def forward(h, w):
        # valid_hw masks the zero-pad bucket halo through the backbone/head
        # and raw_logits skips the device-side upsample (which would
        # interpolate over the PADDED stride-8 grid) — together the valid
        # stride-8 crop equals the exact-shape forward (seg/deeplab.py,
        # tests/test_seg_bucket.py)
        return jax.jit(
            lambda v, x, valid: model.apply(v, x, valid_hw=valid, raw_logits=True)
        )

    def up(logits, out_hw):
        """host bilinear align_corners=True upsample (test.py:84-87)."""
        wh = _resize_weights_np(logits.shape[0], out_hw[0], True)
        ww = _resize_weights_np(logits.shape[1], out_hw[1], True)
        return np.einsum("oh,hwc->owc", wh, np.einsum("pw,hwc->hpc", ww, logits))

    mult = args.bucket
    timer = Timer("Seg test started: ")
    result_list = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        h, w = sample["row"], sample["col"]
        acc = np.zeros((h, w, cfg.MODEL_NUM_CLASSES), np.float32)
        n_views = 0
        for rate in cfg.TEST_MULTISCALE:
            img = sample["image_%f" % rate]
            views = [img]
            if cfg.TEST_FLIP:
                views.append(np.flip(img, axis=1).copy())
            vh, vw = img.shape[:2]
            ph = -(-vh // mult) * mult
            pw = -(-vw // mult) * mult
            batch = np.stack([np.pad(v, ((0, ph - vh), (0, pw - vw), (0, 0))) for v in views])
            valid = jnp.asarray([[vh, vw]] * len(views), jnp.int32)
            logits8 = np.asarray(forward(ph, pw)(variables, batch, valid))
            logits8 = logits8[:, : -(-vh // 8), : -(-vw // 8)]  # valid stride-8 region
            for i, lg in enumerate(logits8):
                # reference chain: stride-8 -> input size (a=True, inside the
                # model, deeplabv1.py:51) -> original size (a=True, test.py:84-87)
                lg = up(up(lg, (vh, vw)), (h, w))
                if i == 1:
                    lg = lg[:, ::-1]
                acc += lg
                n_views += 1
        mean_logits = acc / n_views
        prob = np.exp(mean_logits - mean_logits.max(axis=-1, keepdims=True))
        prob /= prob.sum(axis=-1, keepdims=True)

        if cfg.TEST_CRF:
            img_uint8 = dataset.load_image(sample["name"])
            prob = crf_inference_softmax(
                img_uint8, np.transpose(prob, (2, 0, 1)), t=1,
                labels=cfg.MODEL_NUM_CLASSES,
            )
            pred = np.argmax(prob, axis=0).astype(np.uint8)
        else:
            pred = np.argmax(prob, axis=-1).astype(np.uint8)

        result_list.append({"name": sample["name"], "predict": pred})
        dataset.save_result([result_list[-1]], cfg.MODEL_NAME)
        if (idx + 1) % 25 == 0:
            timer.update_progress((idx + 1) / len(dataset))
            print(f"{idx + 1}/{len(dataset)}, fin: {timer.str_est_finish()}", flush=True)

    if args.period == "test":
        # VOC test split has no public ground truth — predictions are saved
        # for server submission only (reference behavior: save_result, no eval)
        print("Test-period predictions saved (no local ground truth to eval)")
    else:
        resultlog = dataset.do_python_eval(cfg.MODEL_NAME)
        writelog(
            os.path.join(cfg.LOG_DIR, "logfile.txt"), resultlog, f"{args.exp} {args.period}"
        )
    print("Test finished")


if __name__ == "__main__":
    main()
