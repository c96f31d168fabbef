"""Component breakdown of the batched random-walk program (stage 2) on the
chip, plus scatter vs banded dense-matrix construction (ops/pairs.py).

The full program (ROOFLINE.md 5d) runs at 38-45% of bf16 peak and its
squaring chain only accounts for part of that — this script times the
isolated pieces at one shape/batch to locate the rest, then the two full
program variants:

  fwd      AffinityNet forward -> (B, D, P) pair affinities
  mat      vmapped dense (hw, hw) construction from precomputed aff
           (scatter `.at[].add` vs banded select-sum)
  walk     power/normalize/square chain + cam propagation from precomputed
           matrices
  full     the production `_batch_program` (scatter and banded variants)

Run: python scripts/profile_aff_parts.py [--batch 16] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cache_dir", default="/tmp/jax_bench_cache")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from wseg_tpu.infer.rw import RandomWalkRefiner
    from wseg_tpu.models import build_model
    from wseg_tpu.ops.pairs import (
        dense_affinity_matrix,
        dense_affinity_matrix_banded,
        radius_pair_indices,
    )
    from wseg_tpu.ops.random_walk import random_walk_refine

    h, w, b = args.height, args.width, args.batch
    h8, w8 = h // 8, w // 8
    model = build_model("affinity")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 0.5)
    cams = jnp.asarray(rng.rand(b, h, w, 21).astype(np.float32))

    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def timeit(name, fn, *xs):
        t0 = time.perf_counter()
        fn(*xs)
        print(f"[{name}] first call (compile+run) {time.perf_counter() - t0:.1f}s",
              flush=True)
        float(checksum(fn(*xs)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(checksum(fn(*xs)))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"prog": name, "ms": round(dt * 1e3, 2),
                          "ms_per_img": round(dt * 1e3 / b, 3)}), flush=True)
        return dt

    # --- isolated components -------------------------------------------
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    t_fwd = timeit("fwd", fwd, variables, imgs)
    aff = fwd(variables, imgs)  # (B, D, P)

    radius = getattr(model, "radius", 5)
    ind_from_np, ind_to_np = radius_pair_indices(radius, (h8, w8))
    ind_from, ind_to = jnp.asarray(ind_from_np), jnp.asarray(ind_to_np)

    mat_scatter = jax.jit(jax.vmap(
        lambda a: dense_affinity_matrix(a, ind_from, ind_to, h8 * w8)))
    mat_banded = jax.jit(jax.vmap(
        lambda a: dense_affinity_matrix_banded(a, radius, (h8, w8))))
    t_ms = timeit("mat_scatter", mat_scatter, aff)
    t_mb = timeit("mat_banded", mat_banded, aff)

    mats = mat_scatter(aff)
    walk = jax.jit(jax.vmap(lambda m, c: random_walk_refine(c, m)))
    t_walk = timeit("walk", walk, mats, cams)

    # --- full production programs --------------------------------------
    for impl in ("scatter", "banded"):
        refiner = RandomWalkRefiner(model, variables, bucket=64, matrix_impl=impl)
        fn = refiner._batch_program(h, w)
        dt = timeit(f"full_{impl}", fn, variables, imgs, cams)
        print(json.dumps({"summary": f"full_{impl}", "imgs_per_s": round(b / dt, 1)}),
              flush=True)

    print(json.dumps({
        "parts_ms": {"fwd": round(t_fwd * 1e3, 1),
                     "mat_scatter": round(t_ms * 1e3, 1),
                     "mat_banded": round(t_mb * 1e3, 1),
                     "walk": round(t_walk * 1e3, 1)},
        "note": "parts include one checksum sync each; full programs fuse "
                "fwd+mat+walk so parts need not sum to full",
    }), flush=True)


if __name__ == "__main__":
    main()
