"""Profile the TPU CRF alpha-sweep path on the real chip (ROOFLINE.md §5e).

Compares, at the production aff_prepare workload (384x512x21, t=10, AdvCAM
parameterization, 5 alphas on one image):
  a) 5 independent crf_labels_tpu dispatches (cached program, shared bucket)
  b) 1 crf_labels_tpu_batch dispatch (alpha axis vmapped, Nystrom color
     features computed once)

Sync is a jitted scalar checksum + float() (the axon relay's
block_until_ready is a no-op — see bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


# ONE jitted reduction over the whole output list: an eager jnp.sum on a
# device output costs a separate relay dispatch (~190 ms measured) that
# would swamp the 200-400 ms programs being measured
_drain = jax.jit(lambda xs: sum(jnp.sum(x) for x in xs))


def checksum(xs):
    return float(_drain(xs if isinstance(xs, list) else [xs]))


def main():
    from wseg_tpu.ops.crf import make_crf

    h, w = 384, 512
    rng = np.random.RandomState(0)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    labels = (rng.rand(h, w) * 21).astype(np.uint8)
    seeds = np.stack([labels] * 5)
    for i in range(5):  # distinct labelings, like the alpha sweep
        seeds[i] = np.where(rng.rand(h, w) < 0.1 * i, 0, labels)
    kw = dict(n_labels=21, t=10, sxy_gaussian=3, compat_gaussian=3,
              sxy_bilateral=80, srgb=13, compat_bilateral=10,
              masked=True, unary_mode="label")

    single = make_crf((h, w), **kw)
    batch = make_crf((h, w), batch=True, **kw)
    d_img = jax.device_put(img)
    d_seeds = jax.device_put(seeds)

    t0 = time.perf_counter()
    checksum(single(d_seeds[0], d_img, (h, w)))
    print(f"single-program warmup (compile+run): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    checksum(batch(d_seeds, d_img, (h, w)))
    print(f"batch-program warmup (compile+run): {time.perf_counter()-t0:.1f}s")

    # device compute only (inputs resident, ONE terminal scalar sync — the
    # relay round trip is 25-400 ms, so per-output syncs would swamp the
    # 50-200 ms programs being measured)
    for tag, fn in [
        ("5 x single", lambda: [single(d_seeds[i], d_img, (h, w)) for i in range(5)]),
        ("1 x batch5", lambda: [batch(d_seeds, d_img, (h, w))]),
    ]:
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            outs = fn()
            checksum(outs)
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{tag}: device min/med/max {times[0]:.3f}/{times[3]:.3f}/{times[-1]:.3f} s "
              f"per 5-alpha image sweep")

    # end-to-end including the uint8 uploads (production path; note the axon
    # relay's MB/s transfers tax the (5,21,H,W) float download heavily — on
    # local hardware that cost is negligible)
    from wseg_tpu.ops.crf import crf_labels_tpu_batch

    kw2 = dict(t=10, n_labels=21, sxy_gaussian=3, compat_gaussian=3,
               sxy_bilateral=80, srgb=13, compat_bilateral=10)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = crf_labels_tpu_batch(img, seeds, **kw2)
        times.append(time.perf_counter() - t0)
    print(f"end-to-end batch5 incl. relay transfers: "
          f"{sorted(times)[1]:.3f} s median (output {out.nbytes/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
