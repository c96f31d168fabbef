"""Roofline profile of the headline CAM MSF inference pipeline.

For each per-scale program of `make_fused_msf_fn` (and the fuse program),
reports XLA's own cost analysis (flops, bytes) and measured wall time on the
chip, giving achieved TFLOP/s vs the hardware peak — the evidence for how
much headroom the benchmark has left (VERDICT r1 next-round #4).

Run: python scripts/profile_cam.py [--height 384 --width 512 --batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--fused_pcm", action="store_true")
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="chip bf16 peak (v5e: 197 bf16 / 394 int8)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.infer.cam import DEFAULT_SCALES
    from wseg_tpu.models import build_model
    from wseg_tpu.ops.resize import resize_bilinear

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h0, w0 = args.height, args.width
    b = args.batch

    model = build_model("contrast", fused_pcm=args.fused_pcm)
    rng = np.random.RandomState(0)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    if dtype != jnp.float32:
        variables = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables
        )

    def per_scale(v, x, vh, vw):
        bb, two, h, w, _ = x.shape
        _, cam_rv_down = model.apply(v, x.reshape(bb * 2, h, w, 3), raw_cam=True)
        cam = cam_rv_down[..., 1:].astype(jnp.float32)
        cam = resize_bilinear(cam, (vh, vw), align_corners=True)
        cam = resize_bilinear(cam, (h0, w0), align_corners=False)
        cam = cam.reshape(bb, 2, h0, w0, 20)
        cam = cam.at[:, 1].set(cam[:, 1, :, ::-1])
        return cam.sum(axis=1)

    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    total_time = 0.0
    total_flops = 0.0
    rows = []
    for s in DEFAULT_SCALES:
        hs, ws = round(h0 * s), round(w0 * s)
        x = jnp.asarray(rng.rand(b, 2, hs, ws, 3).astype(np.float32), dtype)
        fn = jax.jit(lambda v, xx, vh=hs, vw=ws: per_scale(v, xx, vh, vw))
        lowered = fn.lower(variables, x)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))

        float(checksum(fn(variables, x)))  # warm
        float(checksum(fn(variables, x)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(variables, x)
        float(checksum(out))
        dt = (time.perf_counter() - t0) / args.iters
        total_time += dt
        total_flops += flops
        rows.append({
            "scale": s, "view_hw": [hs, ws], "ms": round(dt * 1e3, 2),
            "gflops": round(flops / 1e9, 1),
            "achieved_tflops": round(flops / dt / 1e12, 1),
            "pct_peak": round(100 * flops / dt / 1e12 / args.peak_tflops, 1),
            "GB_accessed": round(bytes_acc / 1e9, 2),
            "GBps": round(bytes_acc / dt / 1e9, 0),
        })
        print(json.dumps(rows[-1]), flush=True)

    imgs_per_s = b / total_time
    print(json.dumps({
        "summary": {
            "imgs_per_s_excl_fuse": round(imgs_per_s, 2),
            "total_ms_per_batch": round(total_time * 1e3, 1),
            "total_tflops_per_batch": round(total_flops / 1e12, 2),
            "overall_achieved_tflops": round(total_flops / total_time / 1e12, 1),
            "overall_pct_peak": round(
                100 * total_flops / total_time / 1e12 / args.peak_tflops, 1
            ),
            "dtype": args.dtype, "batch": b, "fused_pcm": args.fused_pcm,
        }
    }, indent=None))


if __name__ == "__main__":
    main()
