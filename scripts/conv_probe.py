"""Chip probe: Pallas implicit-GEMM conv vs XLA conv on the trunk's
dominant shape (b6/b7: 3x3 dilation-4, 1024->2048 @ 48x64, bf16).

Run alone (one TPU process at a time): python -m scripts.conv_probe
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from wseg_tpu.kernels.conv_pallas import conv3x3_dilated  # noqa: E402

B, H, W, CI, CO, D = 16, 48, 64, 1024, 2048, 4
FLOPS = 2 * 9 * B * H * W * CI * CO


@jax.jit
def _checksum(y):
    return jnp.sum(y.astype(jnp.float32))


def sync(y):
    return float(_checksum(y))


def time_fn(fn, *args, iters=20):
    y = fn(*args)
    sync(y)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    sync(y)
    dt = (time.perf_counter() - t0) / iters
    return dt, FLOPS / dt / 1e12


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, CI), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, CI, CO), jnp.bfloat16)

    xla = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), [(D, D), (D, D)], rhs_dilation=(D, D),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    dt, tf = time_fn(xla, x, k)
    print(f"xla_conv: {dt*1e3:.3f} ms  {tf:.1f} TF/s")
    ref = xla(x, k)

    for tco in [128, 256, 512]:
        try:
            fn = lambda x, k: conv3x3_dilated(  # noqa: E731
                x, k, dilation=D, tile_co=tco)
            out = fn(x, k)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            dt, tf = time_fn(fn, x, k)
            print(f"pallas tco={tco}: {dt*1e3:.3f} ms  "
                  f"{tf:.1f} TF/s  maxerr={err:.3g}")
        except Exception as e:  # noqa: BLE001
            print(f"pallas tco={tco}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
