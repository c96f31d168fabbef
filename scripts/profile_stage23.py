"""Roofline/throughput profile for stages 2 and 3 on the chip (VERDICT r2 #6).

Section A — aff_infer random-walk refinement (aff_infer.py:88-141): our
batched jitted program (AffinityNet forward -> dense affinity ^beta ->
column-normalized transition -> logt squarings -> cam @ T -> upsample ->
argmax) vs a reference-style execution: the same math as a batch-1 program
with a host sync per image (the reference refines one image at a time on one
GPU).

Section B — seg_test 12-view TTA (lib/utils/test_utils.py:5-31, 6 scales x
flip): our per-scale batched bucketed programs (what cli/seg_test.py runs)
vs reference-style per-view batch-1 programs with a host sync per view.

Prints one JSON row per program plus summaries; records XLA cost analysis
(flops / bytes) so achieved TFLOP/s vs peak is explicit.

Run: python scripts/profile_stage23.py [--stage aff|seg|both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def profile_aff(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model

    h, w = args.height, args.width
    b = args.aff_batch
    model = build_model("affinity")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    refiner = RandomWalkRefiner(model, variables, bucket=64)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.5)
    cams = jnp.asarray(rng.rand(b, h, w, 21).astype(np.float32))

    fn = refiner._batch_program(h, w)
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    lowered = fn.lower(variables, imgs, cams).compile()
    flops, bts = _cost(lowered)

    float(checksum(fn(variables, imgs, cams)))
    float(checksum(fn(variables, imgs, cams)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(variables, imgs, cams)
        float(checksum(out))
    dt = (time.perf_counter() - t0) / args.iters
    ours_ips = b / dt

    # reference-style: the same math as a batch-1 program with one host sync
    # per image (the reference's per-image loop, aff_infer.py:80-141)
    img1, cam1 = imgs[:1], cams[:1]
    prog_b1 = refiner._batch_program(h, w)  # same program; batch dim is data-dep
    float(checksum(prog_b1(variables, img1, cam1)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for i in range(b):
            r = prog_b1(variables, imgs[i : i + 1], cams[i : i + 1])
            float(checksum(r))  # per-image host sync, like the reference loop
    ref_ips = b / ((time.perf_counter() - t0) / args.iters)

    row = {
        "stage": "aff_infer", "image_hw": [h, w], "batch": b,
        "ms_per_batch": round(dt * 1e3, 1),
        "imgs_per_s": round(ours_ips, 2),
        "reference_style_imgs_per_s": round(ref_ips, 2),
        "speedup": round(ours_ips / ref_ips, 2),
        "tflops_per_batch": round(flops / 1e12, 3),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "pct_peak": round(100 * flops / dt / 1e12 / args.peak_tflops, 1),
        "GBps": round(bts / dt / 1e9, 0),
    }
    print(json.dumps(row), flush=True)
    return row


def profile_seg(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.deeplab import generate_net

    cfg = EXPERIMENTS["SEAM_deeplabv1_resnet38"]
    model = generate_net(cfg)
    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k, "dropout": k},
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    h0, w0 = args.height, args.width
    b = args.seg_batch
    rng = np.random.RandomState(0)
    rates = cfg.TEST_MULTISCALE  # (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)

    def pad64(x):
        return -(-x // 64) * 64

    total_dt = 0.0
    total_flops = 0.0
    rows = []
    batches = {}
    for rate in rates:
        vh, vw = int(h0 * rate), int(w0 * rate)
        ph, pw = pad64(vh), pad64(vw)
        batch = np.zeros((b * 2, ph, pw, 3), np.float32)
        view = rng.randn(b, vh, vw, 3).astype(np.float32) * 0.5
        batch[0::2, :vh, :vw] = view
        batch[1::2, :vh, :vw] = view[:, :, ::-1]
        valid = np.full((b * 2, 2), (vh, vw), np.int32)
        xb, vb = jnp.asarray(batch), jnp.asarray(valid)
        batches[rate] = (xb, vb, vh, vw)

        fn = jax.jit(lambda v, x, val: model.apply(v, x, valid_hw=val, raw_logits=True))
        compiled = fn.lower(variables, xb, vb).compile()
        flops, bts = _cost(compiled)
        float(checksum(fn(variables, xb, vb)))
        float(checksum(fn(variables, xb, vb)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(variables, xb, vb)
        float(checksum(out))
        dt = (time.perf_counter() - t0) / args.iters
        total_dt += dt
        total_flops += flops
        rows.append({
            "stage": "seg_tta_scale", "rate": rate, "padded_hw": [ph, pw],
            "ms": round(dt * 1e3, 1),
            "achieved_tflops": round(flops / dt / 1e12, 1),
            "pct_peak": round(100 * flops / dt / 1e12 / args.peak_tflops, 1),
            "GBps": round(bts / dt / 1e9, 0),
        })
        print(json.dumps(rows[-1]), flush=True)
    ours_ips = b / total_dt

    # reference-style: 12 per-view batch-1 programs, host sync per view
    fns = {}
    for rate in rates:
        vh, vw = int(h0 * rate), int(w0 * rate)
        fns[rate] = jax.jit(lambda v, x: model.apply(v, x, raw_logits=True))
        x1 = jnp.asarray(rng.randn(1, vh, vw, 3).astype(np.float32))
        float(checksum(fns[rate](variables, x1)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for i in range(b):
            for rate in rates:
                vh, vw = batches[rate][2], batches[rate][3]
                xb = batches[rate][0]
                for fl in range(2):
                    r = fns[rate](variables, xb[2 * i + fl : 2 * i + fl + 1, :vh, :vw])
                    float(checksum(r))
    ref_ips = b / ((time.perf_counter() - t0) / args.iters)

    summary = {
        "stage": "seg_test_tta", "image_hw": [h0, w0], "batch": b,
        "views": len(rates) * 2,
        "imgs_per_s": round(ours_ips, 2),
        "reference_style_imgs_per_s": round(ref_ips, 2),
        "speedup": round(ours_ips / ref_ips, 2),
        "total_tflops_per_batch": round(total_flops / 1e12, 2),
        "overall_achieved_tflops": round(total_flops / total_dt / 1e12, 1),
        "overall_pct_peak": round(
            100 * total_flops / total_dt / 1e12 / args.peak_tflops, 1
        ),
    }
    print(json.dumps(summary), flush=True)
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="both", choices=["aff", "seg", "both"])
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--aff_batch", type=int, default=4)
    p.add_argument("--seg_batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if args.stage in ("aff", "both"):
        profile_aff(args)
    if args.stage in ("seg", "both"):
        profile_seg(args)


if __name__ == "__main__":
    main()
