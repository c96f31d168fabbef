"""Stage-1 training CLI — flag-compatible rebuild of `contrast_train.py`.

Usage:
  python -m wseg_tpu.cli.contrast_train --weights <pth|ckpt> --voc12_root VOC2012

Differences from the reference driver: one jitted dual-view train step over a
TPU mesh (data-parallel) instead of DataParallel; thread-prefetch input
pipeline; native msgpack checkpoints (plus .pth import).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--max_epoches", default=8, type=int)
    parser.add_argument("--network", default="contrast", type=str)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--wt_dec", default=5e-4, type=float)
    parser.add_argument("--train_list", default="voc12/train_aug.txt", type=str)
    parser.add_argument("--val_list", default="voc12/val.txt", type=str)
    parser.add_argument("--session_name", default="resnet38", type=str)
    parser.add_argument("--crop_size", default=448, type=int)
    parser.add_argument("--low_res", default=128, type=int,
                        help="second-view size (reference downsamples the "
                        "448 crop to 128, contrast_train.py:130-134)")
    parser.add_argument("--min_long", default=448, type=int,
                        help="RandomResizeLong range (contrast_train.py:66)")
    parser.add_argument("--max_long", default=768, type=int)
    parser.add_argument("--weights", default="", type=str)
    parser.add_argument("--voc12_root", default="VOC2012", type=str)
    parser.add_argument("--tblog_dir", default="./tblog", type=str)
    parser.add_argument("--bg_threshold", default=0.20, type=float)
    parser.add_argument("--momentum", default=5e-4, type=float,
                        help="SGD momentum; reference-equivalent default "
                        "(see train/optim.py docstring)")
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--profile_dir", default="", type=str,
                        help="capture a jax.profiler trace of steps 10-15")
    parser.add_argument("--save_every_epoch", action="store_true",
                        help="checkpoint per epoch (reference saves only at the end)")
    parser.add_argument("--stop_after_epoch", default=0, type=int,
                        help="soak/test hook: exit after this many epochs "
                        "WITHOUT writing the final checkpoint (emulates a "
                        "mid-schedule kill; pair with --save_every_epoch). "
                        "The poly-lr schedule still spans --max_epoches")
    parser.add_argument("--start_epoch", default=0, type=int,
                        help="first epoch index for a --resume'd run: epoch-"
                        "indexed shuffle + augmentation make the continuation "
                        "reproduce the uninterrupted run exactly")
    parser.add_argument("--resume", default="", type=str,
                        help="resume params+opt state from a .ckpt")
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = mixed-precision step (f32 master "
                        "weights), ~12%% faster")
    parser.add_argument("--grad_clip", default=0.0, type=float,
                        help="clip gradients to this global norm before the "
                        "optimizer (0 = off, the reference behavior; needed "
                        "when training from RANDOM init, where the "
                        "unnormalized 4096-ch head yields ~1e2 logits and "
                        "the x10-lr head groups diverge in one step)")
    args = parser.parse_args(argv)
    if args.start_epoch > 0 and not args.resume:
        raise SystemExit(
            f"--start_epoch {args.start_epoch} without --resume would skip "
            "epochs and train from init weights with a misleading "
            "global_step/lr; pass --resume <ckpt> (or drop --start_epoch)."
        )

    import jax
    import jax.numpy as jnp
    from wseg_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from wseg_tpu.data.loader import DataLoader
    from wseg_tpu.data.voc12 import ContrastTrainDataset
    from wseg_tpu.models import build_model
    from wseg_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
    from wseg_tpu.train.contrast import TrainState, make_train_step
    from wseg_tpu.train.optim import label_params, poly_sgd
    from wseg_tpu.utils.checkpoint import (
        load_checkpoint, load_pretrained, merge_params, save_checkpoint,
    )
    from wseg_tpu.utils.logging import AverageMeter, Logger, ScalarWriter, Timer

    import random

    random.seed(args.seed)  # host-side augmentations (reference seeds numpy
    np.random.seed(args.seed)  # per worker, contrast_train.py:77-78)

    Logger(os.path.join("result", args.session_name, "contrast.log"))
    print(vars(args))

    model = build_model(args.network)
    tblogger = ScalarWriter(args.tblog_dir)

    dataset = ContrastTrainDataset(
        args.train_list, args.voc12_root, crop_size=args.crop_size,
        min_long=args.min_long, max_long=args.max_long, det_seed=args.seed,
    )
    loader = DataLoader(
        dataset, args.batch_size, shuffle=True, drop_last=True,
        num_workers=args.num_workers, seed=args.seed,
    )
    max_step = len(dataset) // args.batch_size * args.max_epoches

    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(
        rng, jnp.zeros((1, args.crop_size, args.crop_size, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.weights:
        if args.weights.endswith(".ckpt"):
            try:
                loaded = load_checkpoint(
                    args.weights, {"params": params, "batch_stats": batch_stats}
                )
            except Exception as e:
                raise SystemExit(
                    f"--weights {args.weights}: not a params/batch_stats "
                    "checkpoint. Per-epoch checkpoints hold the FULL train "
                    "state (params+optimizer+rng) -- load those with "
                    f"--resume instead. ({e})"
                ) from e
            loaded_params, loaded_stats = loaded["params"], loaded["batch_stats"]
        else:
            loaded_params, loaded_stats = load_pretrained(args.weights)
        params = merge_params(params, loaded_params,
                              what=f"params from {args.weights}")
        batch_stats = merge_params(batch_stats, loaded_stats,
                                   what=f"batch_stats from {args.weights}")
        print(f"loaded pretrained weights from {args.weights}")

    tx = poly_sgd(
        args.lr, args.wt_dec, max_step, momentum=args.momentum,
        labels=label_params(params),
    )
    if args.grad_clip > 0:
        import optax

        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), tx)
    state = TrainState(params, tx.init(params), batch_stats, rng)
    if args.resume:
        state = load_checkpoint(args.resume, state)
        print(f"resumed full train state from {args.resume}")

    mesh = make_mesh_for_batch(args.batch_size)
    state = replicate(mesh, state)
    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
    step_fn = make_train_step(model, tx, args.bg_threshold, low_res=args.low_res,
                              compute_dtype=compute_dtype)

    from wseg_tpu.utils.profiling import trace

    avg_meter = AverageMeter()
    timer = Timer("Session started: ")
    global_step = args.start_epoch * (len(dataset) // args.batch_size)
    pending = []  # device-side metric dicts; pulled to host only at the
    # 50-iter print boundary so the step loop stays async (any device->host
    # round trip blocks on step completion and is expensive on the relay)

    for ep in range(args.start_epoch, args.max_epoches):
        loader.set_epoch(ep)
        for it, (names, imgs, labels) in enumerate(loader):
            batch = shard_batch(
                mesh, (imgs.astype(np.float32), np.stack(labels).astype(np.float32))
            )
            if args.profile_dir and global_step == 10:
                profiler_ctx = trace(args.profile_dir)
                profiler_ctx.__enter__()
            if args.profile_dir and global_step == 15:
                profiler_ctx.__exit__(None, None, None)
            state, metrics = step_fn(state, *batch)
            global_step += 1

            pending.append(metrics)
            if (global_step - 1) % 50 == 0:
                for m in pending:
                    avg_meter.add({k: float(v) for k, v in m.items()})
                pending.clear()
                timer.update_progress(global_step / max_step)
                lr = args.lr * (1 - (global_step - 1) / max_step) ** 0.9
                print(
                    "Iter:%5d/%5d | " % (global_step - 1, max_step),
                    "loss: %.4f | loss_cls: %.4f | loss_er: %.4f | loss_ecr: %.4f | "
                    "loss_nce: %.4f | loss_intra_nce: %.4f | loss_cross_nce: %.4f | loss_cross_nce2: %.4f"
                    % avg_meter.get(
                        "loss", "loss_cls", "loss_er", "loss_ecr",
                        "loss_nce", "loss_intra_nce", "loss_cross_nce", "loss_cross_nce2",
                    ),
                    "imps:%.1f | " % ((it + 1) * args.batch_size / timer.get_stage_elapsed()),
                    "Fin:%s | " % timer.str_est_finish(),
                    "lr: %.4f" % lr,
                    flush=True,
                )
                tblogger.add_scalars(
                    "loss", {k: float(v) for k, v in metrics.items()}, global_step - 1
                )
                tblogger.add_scalar("lr", lr, global_step - 1)
                avg_meter.pop()
        print("")
        timer.reset_stage()
        if args.save_every_epoch:
            ep_ckpt = os.path.join("result", args.session_name, "contrast_train.ckpt")
            save_checkpoint(ep_ckpt, jax.device_get(state))
            print(f"epoch {ep}: saved resumable state to {ep_ckpt} "
                  f"(continue with --resume <ckpt> --start_epoch {ep + 1})",
                  flush=True)
        if args.stop_after_epoch and ep + 1 >= args.stop_after_epoch:
            print(f"stop_after_epoch={args.stop_after_epoch}: exiting without "
                  "final checkpoint (kill emulation)")
            return

    print(args.session_name)
    out = os.path.join("result", args.session_name, "contrast.ckpt")
    save_checkpoint(
        out, {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}
    )
    print(f"saved {out}")


if __name__ == "__main__":
    main()
