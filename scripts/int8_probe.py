"""Probe: does int8 conv actually run at 2x bf16 on this chip via XLA?

Times a b7-shaped conv (the flops-dominant layer family) in bf16 vs int8.
Informs whether an int8 inference mode is worth building (the headline bench
already runs at ~80% of bf16 peak, so sub-bf16 precision is the only
remaining >1.2x lever).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    # b7 c2b1-shape: 3x3 1024->2048 dil4 at 48x64, batch 16 (scale-1 pair x8)
    n, h, w, cin, cout = 16, 48, 64, 1024, 2048

    x32 = rng.rand(n, h, w, cin).astype(np.float32) - 0.5
    k32 = (rng.rand(3, 3, cin, cout).astype(np.float32) - 0.5) * 0.05

    def conv(x, k, acc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(4, 4), (4, 4)], rhs_dilation=(4, 4),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )

    checksum = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    flops = n * h * w * cin * cout * 9 * 2

    results = {}
    for name, xd, kd, acc in [
        ("f32", jnp.float32, jnp.float32, jnp.float32),
        ("bf16", jnp.bfloat16, jnp.bfloat16, jnp.float32),
        ("int8", jnp.int8, jnp.int8, jnp.int32),
    ]:
        if name == "int8":
            x = jnp.asarray((x32 * 127).clip(-127, 127), xd)
            k = jnp.asarray((k32 * 2540).clip(-127, 127), kd)
        else:
            x, k = jnp.asarray(x32, xd), jnp.asarray(k32, kd)
        f = jax.jit(lambda a, b, acc=acc: conv(a, b, acc))
        float(checksum(f(x, k)))  # compile+warm
        float(checksum(f(x, k)))
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(x, k)
        float(checksum(o))
        dt = (time.perf_counter() - t0) / iters
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"speedup_int8_vs_bf16":
                      round(results["bf16"]["ms"] / results["int8"]["ms"], 2)}))


if __name__ == "__main__":
    main()
