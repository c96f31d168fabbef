"""Stage-3 DeepLab testing CLI: multi-scale + flip TTA, optional dense CRF,
mIoU eval — rebuild of `segmentation/experiment/*/test.py:40-113`.

The reference's SEAM/EPS-deeplabv1 test scripts import a nonexistent
`dense_crf_from_deeplabv2` and crash (test.py:28,100 — SURVEY.md §9); here
the deeplabv2-style softmax-unary CRF is actually provided
(ops/densecrf.dense_crf — bilateral sxy=32, 1 iteration, DenseCRF.py:5-39).
"""

from __future__ import annotations

import argparse
import functools
import os
import time

# Widest measured-good TTA dispatch: 16 images (32 flip-rows) at the
# 1.75-scale 384x512 bucket view (672x896, ROOFLINE.md 5d) — batch 32 OOMs
# on that same shape. Any one device dispatch is capped at this many padded
# view pixels (rows*ph*pw) and over-cap scales run as row chunks, so large
# buckets cannot OOM at the wide default (same scheme as aff_infer's
# MAX_WALK_PX).
MAX_TTA_PX = 32 * 672 * 896


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="SEAM_deeplabv1_resnet38")
    parser.add_argument("--data_root", default="VOC2012")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--period", default="val")
    parser.add_argument("--no_crf", action="store_true")
    parser.add_argument("--crf_backend", default="native", choices=["native", "tpu"],
                        help="native = exact C++ permutohedral (post-processing "
                        "runs on a host thread pool, overlapping the next "
                        "batch's TTA forward); tpu = jitted low-rank CRF on "
                        "device (ops/crf.py — frees the host, but shares the "
                        "chip with the TTA)")
    parser.add_argument("--bucket", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=0,
                        help="images per TTA batch; 0 = 16 per device "
                        "(measured 9.1/9.8/10.1 imgs/s at batch 4/8/16 on "
                        "one chip, ROOFLINE.md 5d; each scale's dispatch is "
                        "pixel-capped and row-chunked so large buckets "
                        "cannot OOM). With >1 local chip, batches shard "
                        "over a data-parallel mesh automatically (the "
                        "reference's single_gpu_test is one image on one GPU)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from wseg_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from wseg_tpu.ops.densecrf import dense_crf
    if args.crf_backend == "tpu":
        from wseg_tpu.ops.crf import dense_crf_tpu as dense_crf  # noqa: F811
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

    n_devices = len(jax.devices())
    batch_size = max(args.batch_size or 16 * n_devices, 1)
    data_sharding = None
    if n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wseg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        data_sharding = NamedSharding(mesh, P("data"))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        print(f"data-parallel TTA over {n_devices} chips, batch {batch_size}")

    mult = args.bucket
    n_flip = 2 if cfg.TEST_FLIP else 1
    n_views = len(cfg.TEST_MULTISCALE) * n_flip
    timer = Timer("Seg test started: ")

    from concurrent.futures import ThreadPoolExecutor

    # overlap next-chunk host prep (decode + multiscale resizes) with device
    # compute
    prep_pool = ThreadPoolExecutor(max_workers=2)
    # ...and per-image host POST-processing (12 bilinear upsamples + fusion +
    # CRF + png save) with the NEXT chunk's device compute: the native CRF
    # releases the GIL, and the host einsum upsamples dominate the host side
    post_pool = ThreadPoolExecutor(max_workers=4)
    post_futs = []

    def load_chunk(s):
        return [dataset[i] for i in range(s, min(s + batch_size, len(dataset)))]

    def post_image(sample, views):
        """views: [(stride-8 logits crop, vh, vw, flipped), ...] in the
        reference's view order; accumulation order matches the inline loop
        this replaces, so results are bit-identical."""
        h, w = sample["row"], sample["col"]
        acc = np.zeros((h, w, cfg.MODEL_NUM_CLASSES), np.float32)
        for lg8, vh, vw, flipped in views:
            # reference chain: stride-8 -> input size (a=True, inside the
            # model, deeplabv1.py:51) -> original size (a=True, test.py:84-87)
            lg = up(up(lg8, (vh, vw)), (h, w))
            if flipped:
                lg = lg[:, ::-1]
            acc += lg
        mean_logits = acc / n_views
        prob = np.exp(mean_logits - mean_logits.max(axis=-1, keepdims=True))
        prob /= prob.sum(axis=-1, keepdims=True)

        if cfg.TEST_CRF:
            img_uint8 = dataset.load_image(sample["name"])
            # dense_crf pins the reference's seg parameterization
            # (bilateral sxy=32, n_iters=1 — DenseCRF.py:20-23), which
            # differs from imutils' sxy=80 variant
            prob = dense_crf(
                np.transpose(prob, (2, 0, 1)), img_uint8,
                n_classes=cfg.MODEL_NUM_CLASSES,
            )
            pred = np.argmax(prob, axis=0).astype(np.uint8)
        else:
            pred = np.argmax(prob, axis=-1).astype(np.uint8)
        dataset.save_result([{"name": sample["name"], "predict": pred}], cfg.MODEL_NAME)

    fut = prep_pool.submit(load_chunk, 0)
    for start in range(0, len(dataset), batch_size):
        chunk = fut.result()
        if start + batch_size < len(dataset):
            fut = prep_pool.submit(load_chunk, start + batch_size)
        b = len(chunk)
        scale_outs = []  # (logits8, vhs, vws) per TTA scale, stride-8 sized
        for rate in cfg.TEST_MULTISCALE:
            imgs = [s["image_%f" % rate] for s in chunk]
            vhs = [im.shape[0] for im in imgs]
            vws = [im.shape[1] for im in imgs]
            ph = -(-max(vhs) // mult) * mult
            pw = -(-max(vws) // mult) * mult
            rows = b * n_flip
            # constant row count across chunks (incl. the smaller last one)
            # so every scale reuses one compiled program per (ph, pw)
            r_pad = -(-batch_size * n_flip // n_devices) * n_devices
            # row-chunk any dispatch over the measured pixel budget (the
            # largest scales of large buckets); rounding r_pad up to a
            # multiple of the cap keeps every chunk the same shape, so it is
            # still one compiled program per (ph, pw)
            cap = max(n_devices, MAX_TTA_PX // (ph * pw) // n_devices * n_devices)
            if r_pad > cap:
                r_pad = -(-r_pad // cap) * cap
            batch = np.zeros((r_pad, ph, pw, 3), np.float32)
            valid = np.ones((r_pad, 2), np.int32)
            for i, im in enumerate(imgs):
                batch[n_flip * i, : vhs[i], : vws[i]] = im
                if cfg.TEST_FLIP:
                    batch[n_flip * i + 1, : vhs[i], : vws[i]] = im[:, ::-1]
                valid[n_flip * i : n_flip * i + n_flip] = (vhs[i], vws[i])
            # filler rows (mesh-divisibility) replicate the last view so no
            # degenerate (0, 0) valid region reaches the masked ASPP mean
            for r in range(rows, r_pad):
                batch[r] = batch[rows - 1]
                valid[r] = valid[rows - 1]

            def dispatch(s):
                xb = jnp.asarray(batch[s : s + cap])
                vb = jnp.asarray(valid[s : s + cap], jnp.int32)
                if data_sharding is not None:
                    xb = jax.device_put(xb, data_sharding)
                    vb = jax.device_put(vb, data_sharding)
                return forward(ph, pw)(variables, xb, vb)

            # enqueue all chunks (async dispatch), then pull — compute of
            # chunk k overlaps the host transfer of chunk k-1
            devs = [dispatch(s) for s in range(0, r_pad, cap)]
            out = (np.concatenate([np.asarray(d) for d in devs])
                   if len(devs) > 1 else np.asarray(devs[0]))
            scale_outs.append((out, vhs, vws))
        for i, sample in enumerate(chunk):
            views = []
            for logits8, vhs, vws in scale_outs:
                vh, vw = vhs[i], vws[i]
                lg8 = logits8[n_flip * i : n_flip * i + n_flip,
                              : -(-vh // 8), : -(-vw // 8)]
                for j in range(n_flip):
                    views.append((lg8[j], vh, vw, j == 1))
            post_futs.append(post_pool.submit(post_image, sample, views))
        # backpressure: keep at most ~2 chunks of post work in flight so
        # logits/accumulator memory stays bounded on long runs
        while len(post_futs) > 2 * batch_size:
            post_futs.pop(0).result()
        done = min(start + batch_size, len(dataset))
        if done % 25 < batch_size:
            timer.update_progress(done / len(dataset))
            print(f"{done}/{len(dataset)}, fin: {timer.str_est_finish()}", flush=True)

    for f in post_futs:
        f.result()
    prep_pool.shutdown()
    post_pool.shutdown()
    # steady-state end-to-end rate (TTA + fusion + CRF + save), excluding
    # startup/compile and the eval below — the reference logs per-image
    # progress only; this mirrors contrast_train's `imps` counter
    elapsed = time.time() - timer.start
    print(f"{len(dataset)} images in {elapsed:.1f}s = "
          f"{len(dataset) / elapsed:.2f} imgs/s end-to-end", flush=True)
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
