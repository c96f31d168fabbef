"""Chip profile of the stage-2 (AffinityNet) train step at the reference
hyperparameters (crop 448, batch 8, aff_train.py:15,24): imgs/sec/chip +
XLA cost analysis, same method as scripts/profile_train.py for stage 1.

Run alone: python -m scripts.profile_aff_train
"""

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wseg_tpu.models import build_model  # noqa: E402
from wseg_tpu.train.affinity import AffTrainState, make_aff_train_step  # noqa: E402
from wseg_tpu.train.optim import label_params, poly_sgd  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--crop", type=int, default=448)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args()

    crop, b = args.crop, args.batch
    model = build_model("affinity")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, crop, crop, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = poly_sgd(0.1, 1e-4, max_step=10000, labels=label_params(params))
    state = AffTrainState(params, tx.init(params), batch_stats, rng)
    step = make_aff_train_step(model, tx)

    # label shapes mirror data/voc12.py's ExtractAffinityLabelInRadius
    # output: per-pair bg/fg/neg masks on the stride-8 grid; take the
    # (N, D, P) shape from one forward
    aff_shape = jax.eval_shape(
        lambda v, x: model.apply(v, x), variables,
        jnp.zeros((b, crop, crop, 3), jnp.float32)).shape
    rngn = np.random.RandomState(0)
    img = jnp.asarray(rngn.rand(b, crop, crop, 3), jnp.float32)
    labels = [
        jnp.asarray((rngn.rand(*aff_shape) > 0.7).astype(np.float32))
        for _ in range(3)
    ]

    jstep = jax.jit(step)
    t0 = time.perf_counter()
    state, metrics = jstep(state, img, *labels)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    # reuse the already-compiled wrapper (a fresh jax.jit(step) would lower
    # and compile the step a second time); unwrap the list some jax
    # versions return, like profile_stage23._cost
    ca = jstep.lower(state, img, *labels).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))

    for _ in range(2):
        state, metrics = jstep(state, img, *labels)
        float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = jstep(state, img, *labels)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    tf = flops / dt / 1e12
    print(json.dumps({
        "stage": "aff_train_step", "crop": crop, "batch": b,
        "ms_per_step": round(dt * 1e3, 1),
        "imgs_per_s": round(b / dt, 1),
        "tflops_per_step": round(flops / 1e12, 2),
        "achieved_tflops": round(tf, 1),
        "pct_peak": round(100 * tf / args.peak_tflops, 1),
        "first_compile_s": round(compile_s, 1),
        "loss0": round(l0, 3),
    }))


if __name__ == "__main__":
    main()
