"""AffinityNet training CLI — flag-compatible rebuild of `aff_train.py`."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--max_epoches", default=8, type=int)
    parser.add_argument("--network", default="affinity", type=str)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--wt_dec", default=5e-4, type=float)
    parser.add_argument("--train_list", default="voc12/train_aug.txt", type=str)
    parser.add_argument("--val_list", default="voc12/val.txt", type=str)
    parser.add_argument("--session_name", default="resnet38", type=str)
    parser.add_argument("--crop_size", default=448, type=int)
    parser.add_argument("--weights", default="", type=str)
    parser.add_argument("--voc12_root", default="VOC2012", type=str)
    parser.add_argument("--la_crf_dir", required=True, type=str)
    parser.add_argument("--ha_crf_dir", required=True, type=str)
    parser.add_argument("--momentum", default=5e-4, type=float)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--save_every_epoch", action="store_true",
                        help="checkpoint the FULL train state per epoch")
    parser.add_argument("--resume", default="", type=str,
                        help="resume params+opt state from a per-epoch .ckpt")
    parser.add_argument("--start_epoch", default=0, type=int,
                        help="first epoch of a --resume'd run (epoch-indexed "
                        "shuffle/augmentation make it reproduce the "
                        "uninterrupted run bit-exactly)")
    parser.add_argument("--stop_after_epoch", default=0, type=int,
                        help="exit after this many epochs without the final "
                        "save (kill emulation; see contrast_train)")
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
    from wseg_tpu.data.voc12 import VOC12AffDataset
    from wseg_tpu.models import build_model
    from wseg_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
    from wseg_tpu.train.affinity import AffTrainState, make_aff_train_step
    from wseg_tpu.train.optim import label_params, poly_sgd
    from wseg_tpu.utils.checkpoint import load_checkpoint, load_pretrained, merge_params, save_checkpoint
    from wseg_tpu.utils.logging import AverageMeter, Logger, Timer

    import random

    random.seed(args.seed)
    np.random.seed(args.seed)

    Logger(os.path.join("result", args.session_name, "aff.log"))
    print(vars(args))

    model = build_model(args.network)
    dataset = VOC12AffDataset(
        args.train_list, args.la_crf_dir, args.ha_crf_dir, args.voc12_root,
        cropsize=args.crop_size, det_seed=args.seed,
    )

    def collate(samples):
        imgs = np.stack([s[0] for s in samples])
        bg = np.stack([s[1][0] for s in samples])
        fg = np.stack([s[1][1] for s in samples])
        neg = np.stack([s[1][2] for s in samples])
        return imgs, bg, fg, neg

    loader = DataLoader(
        dataset, args.batch_size, shuffle=True, drop_last=True,
        num_workers=args.num_workers, collate=collate, seed=args.seed,
    )
    max_step = len(dataset) // args.batch_size * args.max_epoches

    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(
        rng, jnp.zeros((1, args.crop_size, args.crop_size, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.weights:
        if args.weights.endswith(".ckpt"):
            # Template-free load: the file may hold a STAGE-1 (contrast)
            # tree, which lacks the affinity head's f8_5 — restoring against
            # this model's template would raise (flax from_bytes is strict
            # about structure). merge_params keeps unmatched entries at
            # their init, the reference's load_state_dict(strict=False)
            # semantics (aff_train's `resnet38_aff` reuses the contrast
            # backbone the same way).
            loaded = load_checkpoint(args.weights, None)
            params = merge_params(params, loaded.get("params", {}),
                                  what=f"params from {args.weights}")
            batch_stats = merge_params(batch_stats, loaded.get("batch_stats", {}),
                                       what=f"batch_stats from {args.weights}")
        else:
            lp, ls = load_pretrained(args.weights)
            params = merge_params(params, lp, what=f"params from {args.weights}")
            batch_stats = merge_params(batch_stats, ls,
                                       what=f"batch_stats from {args.weights}")
        print(f"loaded weights from {args.weights}")

    tx = poly_sgd(args.lr, args.wt_dec, max_step, momentum=args.momentum,
                  labels=label_params(params))
    state = AffTrainState(params, tx.init(params), batch_stats, rng)
    if args.resume:
        state = load_checkpoint(args.resume, state)
        print(f"resumed full train state from {args.resume}")

    mesh = make_mesh_for_batch(args.batch_size)
    state = replicate(mesh, state)
    step_fn = make_aff_train_step(model, tx)

    avg_meter = AverageMeter()
    timer = Timer("Session started: ")
    global_step = args.start_epoch * (len(dataset) // args.batch_size)
    pending = []  # host-sync metrics only at the print boundary (async steps)

    for ep in range(args.start_epoch, args.max_epoches):
        loader.set_epoch(ep)
        for it, (imgs, bg, fg, neg) in enumerate(loader):
            batch = shard_batch(mesh, (imgs, bg, fg, neg))
            state, metrics = step_fn(state, *batch)
            global_step += 1
            pending.append(metrics)
            if (global_step - 1) % 50 == 0:
                for m in pending:
                    avg_meter.add({k: float(v) for k, v in m.items()})
                pending.clear()
                timer.update_progress(global_step / max_step)
                print(
                    "Iter:%5d/%5d" % (global_step - 1, max_step),
                    "loss:%.4f %.4f %.4f %.4f"
                    % avg_meter.get("loss", "bg_loss", "fg_loss", "neg_loss"),
                    "cnt:%.0f %.0f %.0f" % avg_meter.get("bg_cnt", "fg_cnt", "neg_cnt"),
                    "imps:%.1f" % ((it + 1) * args.batch_size / timer.get_stage_elapsed()),
                    "Fin:%s" % timer.str_est_finish(),
                    "lr: %.4f" % (args.lr * (1 - (global_step - 1) / max_step) ** 0.9),
                    flush=True,
                )
                avg_meter.pop()
        print("")
        timer.reset_stage()
        if args.save_every_epoch:
            ep_ckpt = os.path.join("result", args.session_name, "aff_train.ckpt")
            save_checkpoint(ep_ckpt, jax.device_get(state))
            print(f"epoch {ep}: saved resumable state to {ep_ckpt} "
                  f"(continue with --resume <ckpt> --start_epoch {ep + 1})",
                  flush=True)
        if args.stop_after_epoch and ep + 1 >= args.stop_after_epoch:
            print(f"stop_after_epoch={args.stop_after_epoch}: exiting without "
                  "final checkpoint (kill emulation)")
            return

    out = os.path.join("result", args.session_name, "aff.ckpt")
    save_checkpoint(
        out,
        {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)},
    )
    print(f"saved {out}")


if __name__ == "__main__":
    main()
