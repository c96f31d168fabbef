"""Headline benchmark: multi-scale+flip CAM inference throughput per chip.

Metric (BASELINE.json): "CAM imgs/sec/chip (ms+flip infer)" — images per
second through the full SEAM+contrast CAM seed inference: 4 scales
{0.5, 1, 1.5, 2} x {orig, flip} = 8 ResNet-38 forwards per image, fused CAM
at original resolution (contrast_infer.py:38-80 semantics).

vs_baseline is measured ON THE SAME CHIP against a faithful re-creation of
the reference's execution model: one device call per view, sequential, with
per-view host sync, then the reference's literal per-image HOST numpy fusion
(per-view label-mask+flip, 8-view sum, clamp, min/max normalize,
contrast_infer.py:63-81) — what the reference's per-image Python thread
fan-out over replicas (contrast_infer.py:58-71) does on one accelerator. Our number is the fused pipeline (`make_fused_msf_fn`):
per-scale batched programs with device-side upsample/flip/fusion, timed in
steady state (batches in flight back to back, one terminal sync) the way the
CLI's prefetching dispatch loop actually runs.

Environment note: this TPU is reached through a relay where
`block_until_ready` does not actually block and bulk device->host transfers
are slow; timing therefore syncs on a jitted scalar checksum of the output,
which forces execution while transferring 4 bytes.

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _spread(xs):
    return {"min": round(min(xs), 4), "median": round(_median(xs), 4),
            "max": round(max(xs), 4)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["cam", "train"], default="cam",
                        help="cam = headline MSF inference metric; train = "
                        "stage-1 train-step imgs/sec (the reference's imps log)")
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--batch", type=int, default=32,
                        help="images per fused call (32 is the measured "
                        "optimum: the small-scale programs gain MXU "
                        "utilization from width while make_fused_msf_fn "
                        "chunks the scale-2 view to the known-good 16-image "
                        "working set; scripts/batch_probe.py)")
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16",
                        help="our fused path's dtype (bf16 is the TPU-native "
                        "choice); the reference-style baseline always runs f32 "
                        "like the reference")
    parser.add_argument("--fused_pcm", action="store_true",
                        help="route PCM through the fused Pallas kernel")
    parser.add_argument("--skip_reference_style", action="store_true")
    parser.add_argument("--baseline_reps", type=int, default=12,
                        help="repetitions of the reference-style baseline "
                        "(>=12 for a phase-robust per-image median; the CPU "
                        "smoke test drops it to 1)")
    parser.add_argument("--cache_dir", default="/tmp/jax_bench_cache")
    args = parser.parse_args()

    import jax

    # NB: env vars are too late here (jax is already imported by the platform
    # sitecustomize); the config API still applies.
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.infer.cam import DEFAULT_SCALES, make_fused_msf_fn
    from wseg_tpu.models import build_model

    if args.mode == "train":
        return bench_train(args)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h0, w0 = args.height, args.width
    b = args.batch

    model = build_model("contrast", fused_pcm=args.fused_pcm)
    rng = np.random.RandomState(0)
    variables32 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    variables = variables32
    if dtype != jnp.float32:
        variables = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables32
        )

    views = []
    for s in DEFAULT_SCALES:
        hs, ws = round(h0 * s), round(w0 * s)
        views.append(jnp.asarray(rng.rand(b, 2, hs, ws, 3).astype(np.float32), dtype))
    views = tuple(views)
    label = jnp.asarray((rng.rand(b, 20) > 0.5).astype(np.float32), dtype)

    fused = make_fused_msf_fn(model, (h0, w0))
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def run_fused():
        return float(checksum(fused(variables, views, label)))

    t0 = time.perf_counter()
    run_fused()  # compile (patient: remote compile can take minutes cold)
    compile_s = time.perf_counter() - t0
    for _ in range(args.warmup):
        run_fused()
    # Steady-state timing: the CLI pipeline keeps batches in flight (thread
    # prefetch, no host sync between batches), so the fused path is timed as
    # `iters` back-to-back dispatches with one terminal sync — a per-call
    # sync would add one relay round trip per batch (~30 ms, +3% — measured
    # in scripts/sync_probe.py) that real runs never pay. Three trials give
    # the spread (probe: per-trial spread ~0.1%).
    fused_rep_s = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fused(variables, views, label)
        float(checksum(out))
        fused_rep_s.append((time.perf_counter() - t0) / args.iters)
    fused_ips = b / _median(fused_rep_s)

    # Measure the relay's round-trip latency in-run: one trivial jitted
    # scalar program, dispatched and synced repeatedly. The baseline pays ~9
    # of these per image while the fused path pays ~1 per 256 images, so the
    # relay's latency phase at record time sets where in the measured
    # 4.99-5.35 band this run's ratio lands (ROOFLINE.md 5b-3). Recorded so
    # the artifact explains its own landing spot.
    tiny = jax.jit(lambda x: x + 1.0)
    zscalar = jnp.float32(0.0)
    float(tiny(zscalar))  # compile
    rtt_s = []
    for _ in range(30):
        t0 = time.perf_counter()
        float(tiny(zscalar))
        rtt_s.append(time.perf_counter() - t0)

    ref_ips = None
    ref_rep_s = []
    if not args.skip_reference_style:
        # Reference execution model: ONE device program per view, launched
        # sequentially per image with a host sync between views (the
        # reference's thread-pool round-robin, contrast_infer.py:58-71,
        # serializes exactly like this on a single accelerator). Sync is the
        # scalar checksum — NOT a bulk cam transfer — so the comparison
        # measures execution-model overhead, not this environment's
        # pathologically slow relay transfers (which would inflate
        # vs_baseline by another ~100x; see detail.transfer_note).
        from wseg_tpu.ops.resize import resize_bilinear

        fwd_cache = {}

        def fwd_sync(img, vh, vw):
            # reference baseline runs f32, like the reference itself
            img = img.astype(jnp.float32)
            key = img.shape
            if key not in fwd_cache:
                def f(v, x):
                    cam = model.apply(v, x, raw_cam=True)[1][..., 1:]
                    cam = resize_bilinear(cam, (vh, vw), align_corners=True)
                    cam = resize_bilinear(cam, (h0, w0), align_corners=False)
                    return cam, jnp.sum(cam.astype(jnp.float32))
                fwd_cache[key] = jax.jit(f)
            cam, chk = fwd_cache[key](variables32, img)
            float(chk)  # per-view host sync, like the reference's .cpu()
            return cam

        # Per-image fusion runs on the HOST in the reference — per-view
        # label-mask + np.flip, 8-view sum, clamp, min/max normalize
        # (contrast_infer.py:63-81) — so the baseline charges that literal
        # numpy math per image. The device->host cam transfer that precedes
        # it is still excluded (pathological over this relay; ~8 ms on real
        # PCIe for 8 x 15.7 MB), so the fusion runs on pre-staged stand-in
        # arrays of the exact shape/dtype: dense numpy wall time is
        # shape-bound, not value-bound. The fused path does the equivalent
        # fusion ON DEVICE inside its measured time, so both sides are
        # timed to a cam-dict-ready result.
        host_cams = [rng.rand(20, h0, w0).astype(np.float32) for _ in range(8)]
        label_host = (rng.rand(20) > 0.5).astype(np.float32).reshape(20, 1, 1)

        def host_fuse():
            cam_list = []
            for i, hc in enumerate(host_cams):
                cam = hc * label_host
                if i % 2 == 1:
                    cam = np.flip(cam, axis=-1)
                cam_list.append(cam)
            sum_cam = np.sum(cam_list, axis=0)
            sum_cam[sum_cam < 0] = 0
            cam_max = np.max(sum_cam, (1, 2), keepdims=True)
            cam_min = np.min(sum_cam, (1, 2), keepdims=True)
            sum_cam[sum_cam < cam_min + 1e-5] = 0
            return (sum_cam - cam_min - 1e-5) / (cam_max - cam_min + 1e-5)

        host_fuse_s = []

        def run_reference_style(img_s=None, dev_s=None):
            for bi in range(b):
                t0 = time.perf_counter()
                for si in range(len(DEFAULT_SCALES)):
                    vh, vw = views[si].shape[2:4]
                    for fi in range(2):
                        fwd_sync(views[si][bi, fi][None], vh, vw)
                tf = time.perf_counter()
                host_fuse()
                host_fuse_s.append(time.perf_counter() - tf)
                if img_s is not None:
                    img_s.append(time.perf_counter() - t0)
                if dev_s is not None:
                    dev_s.append(tf - t0)

        run_reference_style()  # compile
        ref_img_s = []
        ref_dev_s = []  # device+sync only (the pre-r3 accounting, recorded
        # so the artifact carries the ratio under BOTH definitions)
        # The baseline's per-view host syncs ARE its execution model (the
        # reference does one .cpu() per view), and each image is processed
        # independently — so its throughput is estimated as the median
        # PER-IMAGE wall time over every image of every repetition
        # (12 reps x batch = hundreds of samples). A whole-rep median is
        # hostage to run-level relay phase (each rep crosses 8*batch relay
        # RTTs); the per-image median isolates the model's typical cost from
        # the relay's outliers, which is the honest denominator.
        for _ in range(max(args.baseline_reps, 1)):
            t0 = time.perf_counter()
            run_reference_style(ref_img_s, ref_dev_s)
            ref_rep_s.append(time.perf_counter() - t0)
        ref_ips = 1.0 / _median(ref_img_s)
        ref_ips_dev_only = 1.0 / _median(ref_dev_s)

    # physical ceiling for THIS configuration (ROOFLINE.md 3 derives the
    # default's 16.7 i/s: 11.76 TFLOP/img at 384x512 over the 196.6 TFLOP/s
    # bf16 peak); the workload's FLOPs scale with the pixel count and the
    # f32 MXU peak is half of bf16's
    tflop_per_img = 11.76 * (h0 * w0) / (384 * 512)
    peak_tflops = 196.6 if args.dtype == "bfloat16" else 98.3
    ceiling_ips = peak_tflops / tflop_per_img

    result = {
        "metric": "CAM imgs/sec/chip (ms+flip infer)",
        "value": round(fused_ips, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(fused_ips / ref_ips, 3) if ref_ips else None,
        "detail": {
            "image_hw": [h0, w0],
            "batch": b,
            "dtype": args.dtype,
            "fused_pcm": args.fused_pcm,
            "reference_style_ips": round(ref_ips, 3) if ref_ips else None,
            # both accountings (VERDICT r3 item 2): the headline charges the
            # reference's literal host fusion; this row is the ratio under
            # the old device+sync-only definition
            "vs_baseline_device_sync_only": (
                round(fused_ips / ref_ips_dev_only, 3) if ref_ips else None
            ),
            "reference_img_device_s": _spread(ref_dev_s) if ref_ips else None,
            "fused_reps": f"3 trials x {args.iters} pipelined batches",
            "baseline_reps": len(ref_rep_s) if ref_rep_s else 0,
            "baseline_img_samples": len(ref_img_s) if ref_ips else 0,
            "fused_rep_s": _spread(fused_rep_s),
            "reference_rep_s": _spread(ref_rep_s) if ref_ips else None,
            "reference_img_s": _spread(ref_img_s) if ref_ips else None,
            "first_compile_s": round(compile_s, 1),
            "relay_rtt_ms": _spread([r * 1000 for r in rtt_s]),
            "physical_ceiling_ips": round(ceiling_ips, 1),
            "pct_of_physical_ceiling": round(fused_ips / ceiling_ips * 100, 1),
            "host_fuse_ms": _spread([s * 1000 for s in host_fuse_s])
            if host_fuse_s else None,
            "transfer_note": "baseline syncs per view via scalar checksum; "
            "with the reference's per-view bulk cam transfers it measures "
            "~0.017 i/s on this relay (100x slower), which would overstate "
            "the speedup. The reference's per-image HOST fusion "
            "(contrast_infer.py:63-81: per-view label-mask+flip, 8-view "
            "sum, clamp, min/max norm) IS charged, on pre-staged "
            "stand-in arrays (numpy wall time is shape-bound); "
            "detail.host_fuse_ms records it. The fused path performs the "
            "same fusion on device inside its measured time, so both "
            "sides are timed to a cam-dict-ready result",
            "ratio_band_note": "the fused value reproduces to 0.03% across "
            "runs; the baseline pays 8 relay round trips per image, so "
            "vs_baseline moves with the relay's latency phase (measured "
            "band 4.96-5.35 over five runs under the pre-host-fusion "
            "definition, ROOFLINE.md 5b-3/5b-4); detail.relay_rtt_ms "
            "records this run's phase in-run; the 16.7 i/s physical "
            "ceiling (11.76 TFLOP/img at 197 TFLOP/s bf16 peak) is "
            "derived in ROOFLINE.md 3",
        },
    }
    print(json.dumps(result))


def bench_train(args):
    """Stage-1 dual-view train-step throughput (imgs/sec/chip) at the
    reference hyperparameters (crop 448, the reference logs this as `imps`,
    contrast_train.py:418)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.models import build_model
    from wseg_tpu.train.contrast import TrainState, make_train_step
    from wseg_tpu.train.optim import label_params, poly_sgd

    crop = args.height if args.height != 384 else 448
    b = args.batch
    model = build_model("contrast")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, crop, crop, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = poly_sgd(0.01, 5e-4, max_step=10000, labels=label_params(params))
    state = TrainState(params, tx.init(params), batch_stats, rng)
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    step = make_train_step(model, tx, compute_dtype=compute_dtype)

    rngn = np.random.RandomState(0)
    img = jnp.asarray(rngn.rand(b, crop, crop, 3), jnp.float32)
    label = jnp.asarray((rngn.rand(b, 20) > 0.7).astype(np.float32))

    t0 = time.perf_counter()
    state, metrics = step(state, img, label)
    loss0 = float(metrics["loss"])  # forces compile + run
    compile_s = time.perf_counter() - t0

    for _ in range(args.warmup):
        state, metrics = step(state, img, label)
        float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, img, label)
        float(metrics["loss"])
    dt = time.perf_counter() - t0
    ips = b * args.iters / dt
    print(json.dumps({
        "metric": "train imgs/sec/chip (stage-1 dual-view step)",
        "value": round(ips, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "detail": {"crop": crop, "batch": b, "dtype": args.dtype,
                   "first_compile_s": round(compile_s, 1),
                   "loss0": round(loss0, 4)},
    }))


if __name__ == "__main__":
    main()
