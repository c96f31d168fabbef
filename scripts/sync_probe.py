"""Chip probe: per-call host sync vs pipelined dispatch on the fused MSF
program. Quantifies the axon-relay round-trip cost that bench.py's
per-repetition sync adds on top of pure device throughput.

Run alone: python -m scripts.sync_probe
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wseg_tpu.infer.cam import DEFAULT_SCALES, make_fused_msf_fn  # noqa: E402
from wseg_tpu.models import build_model  # noqa: E402

H, W, B, REPS = 384, 512, 16, 8


def main():
    model = build_model("contrast")
    rng = np.random.RandomState(0)
    v32 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v32)
    views = tuple(
        jnp.asarray(rng.rand(B, 2, round(H * s), round(W * s), 3)
                    .astype(np.float32), jnp.bfloat16)
        for s in DEFAULT_SCALES)
    label = jnp.asarray((rng.rand(B, 20) > 0.5).astype(np.float32), jnp.bfloat16)

    fused = make_fused_msf_fn(model, (H, W))
    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    # warm
    for _ in range(3):
        float(checksum(fused(variables, views, label)))

    # (a) per-call sync (bench.py's current model)
    per_call = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(checksum(fused(variables, views, label)))
        per_call.append(time.perf_counter() - t0)
    a = sorted(per_call)[REPS // 2]
    print(f"per-call sync:   median {a*1e3:.1f} ms/rep -> {B/a:.3f} i/s "
          f"(spread {min(per_call)*1e3:.1f}-{max(per_call)*1e3:.1f})")

    # (b) pipelined: issue REPS calls, one sync at the end
    for trial in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fused(variables, views, label)
        float(checksum(out))
        dt = (time.perf_counter() - t0) / REPS
        print(f"pipelined x{REPS} (trial {trial}): {dt*1e3:.1f} ms/rep -> "
              f"{B/dt:.3f} i/s")


if __name__ == "__main__":
    main()
