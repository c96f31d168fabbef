"""Roofline profile of the stage-1 dual-view train step (the other hot loop,
companion to scripts/profile_cam.py — evidence for ROOFLINE.md).

Lowers the real jitted train step, reads XLA's own cost analysis, and times
it on the chip. Run: python scripts/profile_train.py [--batch 16 --crop 448]
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
    p.add_argument("--crop", type=int, default=448)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.models import build_model
    from wseg_tpu.train.contrast import TrainState, make_train_step
    from wseg_tpu.train.optim import label_params, poly_sgd

    crop, b = args.crop, args.batch
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

    jitted = jax.jit(step) if not hasattr(step, "lower") else step
    lowered = jitted.lower(state, img, label)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    state, metrics = jitted(state, img, label)
    float(metrics["loss"])  # warm
    state, metrics = jitted(state, img, label)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = jitted(state, img, label)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "crop": crop, "batch": b, "dtype": args.dtype,
        "ms_per_step": round(dt * 1e3, 2),
        "imgs_per_s": round(b / dt, 2),
        "tflop_per_step": round(flops / 1e12, 2),
        "tflop_per_img": round(flops / b / 1e12, 3),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "pct_peak": round(100 * flops / dt / 1e12 / args.peak_tflops, 1),
        "GB_accessed": round(bytes_acc / 1e9, 2),
        "GBps": round(bytes_acc / dt / 1e9, 0),
    }))


if __name__ == "__main__":
    main()
