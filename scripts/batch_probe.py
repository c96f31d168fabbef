"""Probe: per-scale CAM program throughput vs batch width.

ROOFLINE.md §2 shows the small-scale programs under-utilize the MXU
(scale 0.5 at 63% of peak vs scale 2.0 at 85% — small spatial dims leave
tiles short). This probe measures whether widening ONLY the small scales'
batch (processing several image-batches' 0.5/1.0 views in one dispatch)
buys real throughput, before restructuring the pipeline around it.

Timing matches bench.py's steady-state model: back-to-back dispatches,
one terminal scalar-checksum sync (the relay's block_until_ready is a
no-op).
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
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--cache_dir", default="/tmp/jax_bench_cache")
    p.add_argument("--configs", default="",
                   help="comma list of scale:batch pairs, e.g. '1.5:32,2.0:20'")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.models import build_model
    from wseg_tpu.ops.resize import resize_bilinear_chain

    h0, w0 = args.height, args.width
    model = build_model("contrast")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )

    @jax.jit
    def per_scale(variables, v):
        b, two, h, w, _ = v.shape
        _, cam_rv_down = model.apply(variables, v.reshape(b * 2, h, w, 3), raw_cam=True)
        cam = cam_rv_down[..., 1:].astype(jnp.float32)
        cam = resize_bilinear_chain(cam, (h, w), (h0, w0))
        cam = cam.reshape(b, 2, h0, w0, 20)
        cam = cam.at[:, 1].set(cam[:, 1, :, ::-1])
        return cam.sum(axis=1)

    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    rng = np.random.RandomState(0)

    # defaults reproduce the ROOFLINE.md 5b-2 decision table end to end,
    # including the scale-2 rows whose OOM point set MAX_VIEW_PX (b32 is
    # EXPECTED to print an OOM row on the 16 GB chip) and the 1.5:32 win
    # behind the batch-32 bench default
    configs = [
        (0.5, (16, 32, 64)),
        (1.0, (16, 32)),
        (1.5, (16, 32)),
        (2.0, (16, 20, 24, 32)),
    ]
    if args.configs:
        configs = []
        for tok in args.configs.split(","):
            s, b = tok.split(":")
            configs.append((float(s), (int(b),)))

    results = []
    for scale, batches in configs:
        hs, ws = round(h0 * scale), round(w0 * scale)
        for b in batches:
            v = jnp.asarray(rng.rand(b, 2, hs, ws, 3).astype(np.float32), jnp.bfloat16)
            t0 = time.perf_counter()
            try:
                out = per_scale(variables, v)
                float(checksum(out))
            except Exception as e:  # OOM on the big shapes is an answer too
                print(json.dumps({"scale": scale, "batch": b,
                                  "error": str(e).splitlines()[0][:200]}), flush=True)
                continue
            compile_s = time.perf_counter() - t0
            # warmup
            float(checksum(per_scale(variables, v)))
            trials = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = per_scale(variables, v)
                float(checksum(out))
                trials.append((time.perf_counter() - t0) / args.iters)
            dt = sorted(trials)[1]
            row = {
                "scale": scale, "batch": b, "ms_per_dispatch": round(dt * 1e3, 1),
                "imgs_per_s": round(b / dt, 2), "ms_per_img": round(dt / b * 1e3, 2),
                "compile_s": round(compile_s, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
