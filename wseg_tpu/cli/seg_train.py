"""Stage-3 DeepLab retraining CLI.

Rebuild of `segmentation/experiment/*/train.py` as one driver parameterized
by experiment name (--exp SEAM_deeplabv1_resnet38 | EPS_deeplabv1_resnet101 |
EPS_deeplabv2_resnet101) with config overrides via flags.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="SEAM_deeplabv1_resnet38",
                        help="experiment preset name")
    parser.add_argument("--data_root", default="VOC2012")
    parser.add_argument("--pseudo_gt", default="", help="DATA_PSEUDO_GT dir")
    parser.add_argument("--train_ckpt", default="")
    parser.add_argument("--backbone_weights", default="",
                        help="stage-1 backbone checkpoint (.ckpt or .pth)")
    parser.add_argument("--iterations", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--crop", type=int, default=None)
    parser.add_argument("--bn_mom", type=float, default=None,
                        help="override TRAIN_BN_MOM: the reference's 0.0003 "
                        "(backbone/resnet38d.py:8) assumes a 20k-iteration "
                        "schedule; short runs need ~0.1 for the running "
                        "stats to reach the batch statistics by eval time")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--save_state", action="store_true",
                        help="additionally checkpoint the FULL train state "
                        "(params+optimizer+rng) per epoch, for exact resume")
    parser.add_argument("--resume", default="",
                        help="resume the FULL train state from a "
                        "seg_train_state.ckpt (bit-exact continuation; "
                        "--train_ckpt restores params only, the reference's "
                        "TRAIN_CKPT semantics)")
    parser.add_argument("--min_epoch", type=int, default=None,
                        help="override TRAIN_MINEPOCH (the first epoch of a "
                        "--resume'd run)")
    parser.add_argument("--stop_after_epoch", type=int, default=0,
                        help="exit after this many epochs without the final "
                        "save (kill emulation; pair with --save_state)")
    args = parser.parse_args(argv)

    import random

    import jax
    import jax.numpy as jnp
    from wseg_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from wseg_tpu.data.loader import DataLoader
    from wseg_tpu.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
    from wseg_tpu.seg.config import EXPERIMENTS
    from wseg_tpu.seg.dataset import generate_dataset
    from wseg_tpu.seg.deeplab import generate_net, seg_param_labels
    from wseg_tpu.train.optim import poly_sgd
    from wseg_tpu.train.seg import SegTrainState, make_seg_train_step
    from wseg_tpu.utils.checkpoint import (
        load_checkpoint, load_pretrained, merge_params, save_checkpoint,
    )
    from wseg_tpu.utils.logging import Logger, ScalarWriter, Timer

    random.seed(args.seed)
    np.random.seed(args.seed)

    cfg = EXPERIMENTS[args.exp].replace(DATA_ROOT=args.data_root)
    if args.pseudo_gt:
        cfg = cfg.replace(DATA_PSEUDO_GT=args.pseudo_gt)
    if args.iterations:
        cfg = cfg.replace(TRAIN_ITERATION=args.iterations)
    if args.batch_size:
        cfg = cfg.replace(TRAIN_BATCHES=args.batch_size)
    if args.lr:
        cfg = cfg.replace(TRAIN_LR=args.lr)
    if args.crop:
        cfg = cfg.replace(DATA_RANDOMCROP=args.crop)
    if args.bn_mom is not None:  # 0.0 (fully frozen stats) is a valid value
        cfg = cfg.replace(TRAIN_BN_MOM=args.bn_mom)
    if args.train_ckpt:
        cfg = cfg.replace(TRAIN_CKPT=args.train_ckpt)
    if args.backbone_weights:
        cfg = cfg.replace(MODEL_BACKBONE_WEIGHTS=args.backbone_weights)
    if args.min_epoch is not None:
        cfg = cfg.replace(TRAIN_MINEPOCH=args.min_epoch)
    if cfg.TRAIN_MINEPOCH > 0 and not (args.resume or cfg.TRAIN_CKPT):
        raise SystemExit(
            f"--min_epoch {cfg.TRAIN_MINEPOCH} without --resume (or "
            "--train_ckpt) would skip epochs and train from init weights "
            "with a misleading iteration/lr; pass --resume <ckpt> (or drop "
            "--min_epoch)."
        )

    os.makedirs(cfg.MODEL_SAVE_DIR, exist_ok=True)
    Logger(os.path.join(cfg.LOG_DIR, "train.log"))
    print(cfg)

    dataset = generate_dataset(cfg, period="train", transform="weak",
                               det_seed=args.seed)

    def collate(samples):
        return (
            np.stack([s["image"] for s in samples]),
            np.stack([s["segmentation"] for s in samples]),
        )

    loader = DataLoader(dataset, cfg.TRAIN_BATCHES, shuffle=cfg.TRAIN_SHUFFLE,
                        drop_last=True, num_workers=cfg.DATA_WORKERS,
                        collate=collate, seed=args.seed)

    model = generate_net(cfg)
    rng = jax.random.PRNGKey(args.seed)
    crop = cfg.DATA_RANDOMCROP
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, crop, crop, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    if cfg.MODEL_BACKBONE_WEIGHTS:
        # overlay a stage-1 backbone checkpoint onto params['backbone'].
        # Raw (template-free) load: the file holds a STAGE-1 model tree, so
        # restoring against the seg-model template would raise on the head
        # keys (flax from_bytes is strict about structure)
        if cfg.MODEL_BACKBONE_WEIGHTS.endswith(".ckpt"):
            loaded = load_checkpoint(cfg.MODEL_BACKBONE_WEIGHTS, None)
            lp = loaded.get("params", {})
            ls = loaded.get("batch_stats", {})  # params-only ckpts are fine
        else:
            lp, ls = load_pretrained(cfg.MODEL_BACKBONE_WEIGHTS)
        # stage-1 trees root at 'backbone'; seg resnet38 nests it one deeper
        if cfg.MODEL_BACKBONE == "resnet38" and "backbone" in lp:
            lp = {"backbone": {"resnet38": lp["backbone"]}}
            ls = {"backbone": {"resnet38": ls.get("backbone", {})}}
        params = merge_params(params, lp,
                              what=f"params from {cfg.MODEL_BACKBONE_WEIGHTS}")
        batch_stats = merge_params(batch_stats, ls,
                                   what=f"batch_stats from {cfg.MODEL_BACKBONE_WEIGHTS}")
        print(f"loaded backbone weights from {cfg.MODEL_BACKBONE_WEIGHTS}")

    if cfg.TRAIN_CKPT:
        loaded = load_checkpoint(
            cfg.TRAIN_CKPT, {"params": params, "batch_stats": batch_stats}
        )
        params, batch_stats = loaded["params"], loaded["batch_stats"]
        print(f"resumed from {cfg.TRAIN_CKPT}")

    max_itr = cfg.TRAIN_ITERATION
    tx = poly_sgd(
        cfg.TRAIN_LR, cfg.TRAIN_WEIGHT_DECAY, max_step=max_itr + 1,
        power=cfg.TRAIN_POWER, momentum=cfg.TRAIN_MOMENTUM,
        labels=seg_param_labels(
            params, scratch_mods=getattr(type(model), "FROM_SCRATCH", None)
        ),
    )
    state = SegTrainState(params, tx.init(params), batch_stats, rng)
    if args.resume:
        state = load_checkpoint(args.resume, state)
        print(f"resumed full train state from {args.resume}")

    mesh = make_mesh_for_batch(cfg.TRAIN_BATCHES)
    state = replicate(mesh, state)
    step_fn = make_seg_train_step(model, tx, with_pred=cfg.TRAIN_TBLOG)

    tblogger = ScalarWriter(cfg.LOG_DIR)
    timer = Timer("Seg train started: ")
    itr = cfg.TRAIN_MINEPOCH * (len(dataset) // cfg.TRAIN_BATCHES)
    max_epoch = max_itr * cfg.TRAIN_BATCHES // len(dataset) + 1

    done = False
    for epoch in range(cfg.TRAIN_MINEPOCH, max_epoch):
        if done:
            break
        loader.set_epoch(epoch)
        for imgs, segs in loader:
            batch = shard_batch(mesh, (imgs, segs))
            state, metrics = step_fn(state, *batch)
            if itr % 100 == 0:
                now_lr = cfg.TRAIN_LR * (1 - itr / (max_itr + 1)) ** cfg.TRAIN_POWER
                loss = float(metrics["loss"])
                timer.update_progress(max(itr, 1) / max_itr)
                print(f"itr:{itr}/{max_itr} loss:{loss:.4f} lr:{now_lr:.6f} "
                      f"fin:{timer.str_est_finish()}", flush=True)
                tblogger.add_scalar("loss", loss, itr)
                tblogger.add_scalar("lr", now_lr, itr)
                if cfg.TRAIN_TBLOG:
                    # input / label / pred colormaps of the last batch sample
                    # (reference train.py:107-120)
                    from wseg_tpu.utils.visualization import (
                        img_denorm, voc_label2colormap,
                    )

                    inp = img_denorm(np.asarray(imgs[-1])).astype(np.uint8)
                    lbl_color = voc_label2colormap(np.asarray(segs[-1]))
                    seg_color = voc_label2colormap(np.asarray(metrics["pred"]))
                    tblogger.add_image("Input", inp, itr)
                    tblogger.add_image("Label", lbl_color, itr)
                    tblogger.add_image("SEG1", seg_color, itr)
            itr += 1
            if itr >= max_itr:
                done = True
                break
        ckpt = os.path.join(
            cfg.MODEL_SAVE_DIR,
            f"{cfg.MODEL_NAME}_{cfg.MODEL_BACKBONE}_{cfg.DATA_NAME}_epoch{epoch}.ckpt",
        )
        save_checkpoint(ckpt, {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        })
        print(f"{ckpt} has been saved")
        prev = os.path.join(
            cfg.MODEL_SAVE_DIR,
            f"{cfg.MODEL_NAME}_{cfg.MODEL_BACKBONE}_{cfg.DATA_NAME}_epoch{epoch - 1}.ckpt",
        )
        if os.path.exists(prev):
            os.remove(prev)
        if args.save_state:
            st = os.path.join(cfg.MODEL_SAVE_DIR, "seg_train_state.ckpt")
            save_checkpoint(st, jax.device_get(state))
            print(f"epoch {epoch}: saved resumable state to {st} "
                  f"(continue with --resume <ckpt> --min_epoch {epoch + 1})",
                  flush=True)
        if args.stop_after_epoch and epoch + 1 >= args.stop_after_epoch:
            print(f"stop_after_epoch={args.stop_after_epoch}: exiting without "
                  "final checkpoint (kill emulation)")
            return

    final = os.path.join(
        cfg.MODEL_SAVE_DIR,
        f"{cfg.MODEL_NAME}_{cfg.MODEL_BACKBONE}_{cfg.DATA_NAME}_itr{max_itr}_all.ckpt",
    )
    save_checkpoint(final, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    })
    print(f"{final} has been saved")


if __name__ == "__main__":
    main()
