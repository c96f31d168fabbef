"""Chip profile of the stage-3 (DeepLab retrain) train step at the reference
hyperparameters (SEAM_deeplabv1_resnet38 preset: crop 448, batch 10, SGD
momentum 0.9, poly lr — segmentation/experiment/SEAM_deeplabv1_resnet38/
{config,train}.py): imgs/sec/chip + XLA cost analysis, same method as
scripts/profile_train.py (stage 1) and scripts/profile_aff_train.py (stage 2).

Run alone: python -m scripts.profile_seg_train
"""

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wseg_tpu.seg.config import EXPERIMENTS  # noqa: E402
from wseg_tpu.seg.deeplab import generate_net, seg_param_labels  # noqa: E402
from wseg_tpu.train.optim import poly_sgd  # noqa: E402
from wseg_tpu.train.seg import SegTrainState, make_seg_train_step  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="SEAM_deeplabv1_resnet38")
    p.add_argument("--crop", type=int, default=0, help="0 = preset's crop")
    p.add_argument("--batch", type=int, default=0, help="0 = preset's batch")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="bf16 nominal; the step runs the reference's f32, "
                   "pass 98.3 to rate against the f32 peak")
    args = p.parse_args()

    cfg = EXPERIMENTS[args.preset]
    crop = args.crop or cfg.DATA_RANDOMCROP
    b = args.batch or cfg.TRAIN_BATCHES

    model = generate_net(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, crop, crop, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = poly_sgd(
        cfg.TRAIN_LR, cfg.TRAIN_WEIGHT_DECAY, max_step=cfg.TRAIN_ITERATION + 1,
        power=cfg.TRAIN_POWER, momentum=cfg.TRAIN_MOMENTUM,
        labels=seg_param_labels(params),
    )
    state = SegTrainState(params, tx.init(params), batch_stats, rng)
    step = make_seg_train_step(model, tx)

    rngn = np.random.RandomState(0)
    img = jnp.asarray(rngn.rand(b, crop, crop, 3), jnp.float32)
    # pseudo-GT labels with the reference's ignore regions (255)
    lab = rngn.randint(0, 21, size=(b, crop, crop))
    lab[rngn.rand(b, crop, crop) < 0.1] = 255
    seg_label = jnp.asarray(lab, jnp.int32)

    t0 = time.perf_counter()
    state, metrics = step(state, img, seg_label)
    l0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    ca = step.lower(state, img, seg_label).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))

    for _ in range(2):
        state, metrics = step(state, img, seg_label)
        float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, img, seg_label)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    tf = flops / dt / 1e12
    print(json.dumps({
        "stage": "seg_train_step", "preset": args.preset, "crop": crop,
        "batch": b,
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
