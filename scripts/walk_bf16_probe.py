"""Stage-2 walk probes on the chip (VERDICT r3 item 5).

(a) Verify the SHIPPED aff_infer default (batch 96/device, pixel-capped)
    reaches the measured 118.5 imgs/s at 384x512.
(b) Measure the bf16 matrix-power chain (ops/random_walk.py compute_dtype)
    against f32: throughput AND the argmax flip rate on identical inputs —
    the walk is latency/HBM-bound at ~50% of peak (ROOFLINE.md 5d), so
    halving the T-matrix bytes is the one untried lever.

Run: python scripts/walk_bf16_probe.py [--batch 96] [--iters 3]
Prints one JSON row per arm.
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
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from wseg_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model

    h, w, b = args.height, args.width, args.batch
    model = build_model("affinity")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.5)
    cams = jnp.asarray(rng.rand(b, h, w, 21).astype(np.float32))
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)))

    preds = {}
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        refiner = RandomWalkRefiner(model, variables, bucket=64, walk_dtype=dtype)
        fn = refiner._batch_program(h, w)
        out = fn(variables, imgs, cams)
        float(checksum(out))  # warm + sync (block_until_ready is a relay no-op)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(variables, imgs, cams)
            float(checksum(out))
        dt = (time.perf_counter() - t0) / args.iters
        preds[name] = np.asarray(out)
        print(json.dumps({
            "arm": name, "batch": b, "hw": [h, w],
            "sec_per_batch": round(dt, 4), "imgs_per_sec": round(b / dt, 2),
        }), flush=True)

    flip = float((preds["bf16"] != preds["f32"]).mean())
    print(json.dumps({"argmax_flip_rate_bf16_vs_f32": round(flip, 6)}))


if __name__ == "__main__":
    main()
