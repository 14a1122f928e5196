"""AVS training/eval driver — the `avs_scripts/avs_s4/train.py` +
`avs_ms3/train.py` equivalent (S4 and MS3 via --task).

Real-data loops mirror the reference: per-epoch val mIoU with
best-checkpoint save + early-stop counter (avs_s4/train.py:313-345), and a
test report of mIoU + F-score (test.py:134-145). MS3 trains with all-frame
masks and the KL masked-AV loss (avs_ms3/train.sh flags).

Dataset layout note: both S4 and MS3 use the S4-style directory tree here
(`visual_frames/<split>/<cat>/<vid>`); the reference's MS3 csv layout carries
the same content.

Usage:
    python -m dg_sct_tpu.train.avs_main --mode smoke --task s4
    python -m dg_sct_tpu.train.avs_main --mode train --task ms3 --root AVSBench
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVSModelConfig, TrainConfig
from ..data import ave as ave_data
from ..data import avs as avs_data
from ..models import avs as avs_model
from ..utils import checkpoint as ckpt_lib
from ..utils.compile_cache import enable_persistent_cache
from ..utils.metrics_log import MetricsLogger, snapshot_run
from . import avs_train
from .metrics import f_measure, mask_iou
from .optim import count_params


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--task", choices=["s4", "ms3"], default="s4")
    p.add_argument("--root", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save-dir", default="checkpoints/avs")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--early-stop", type=int, default=5)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--synthetic-steps", type=int, default=1)
    p.add_argument("--save-pred-mask", action="store_true",
                   help="write thresholded prediction pngs during --mode eval "
                        "(test.py --save_pred_mask / utility.py:122)")
    return p.parse_args(argv)


def make_dataset(args, split, mask_num, cfg: AVSModelConfig):
    return avs_data.S4Dataset(
        args.root, split, mask_num=mask_num, img_size=cfg.mask_size,
        num_frames=cfg.num_frames,
        segment_samples=cfg.htsat.frontend.clip_samples)


def prep_batch(batch, task):
    """Collated mask (B, mask_num, H, W, 1) -> loss layout: S4 first-frame
    (B, H, W, 1); MS3 all-frame (B*T, H, W, 1)."""
    out = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    m = out["mask"]
    out["mask"] = m[:, 0] if task == "s4" else m.reshape(-1, *m.shape[2:])
    return {k: jnp.asarray(v) for k, v in out.items()}


def evaluate(estep, tr, fr, state, dataset, *, batch_size=4, with_f=False,
             save_dir=None, num_frames=5):
    """Val loop: mIoU over all frames (train.py:313-327); test adds F-score
    (test.py:134-145) and optional prediction-png dumps (test.py:130-132)."""
    from .metrics import save_masks

    ious, fs, n = [], [], 0
    for batch in ave_data.batched_iterator(dataset, batch_size, shuffle=False,
                                           drop_last=False):
        gt = batch["mask"].reshape(-1, *batch["mask"].shape[2:])  # (B*T, H, W, 1)
        feed = {k: jnp.asarray(v) for k, v in batch.items()
                if k in ("image", "wave")}
        pred = np.asarray(estep(tr, fr, state, feed))             # (B*T, H, W, 1)
        ious.append(mask_iou(pred[..., 0], gt[..., 0]) * len(pred))
        if with_f:
            fs.append(f_measure(pred[..., 0], gt[..., 0]) * len(pred))
        if save_dir is not None and "category" in batch:
            save_masks(pred[..., 0], save_dir, batch["category"],
                       batch["video"], num_frames)
        n += len(pred)
    miou = sum(ious) / max(n, 1)
    return (miou, sum(fs) / max(n, 1)) if with_f else miou


def main(argv=None, cfg: AVSModelConfig | None = None):
    args = parse_args(argv)
    enable_persistent_cache()
    cfg = cfg or AVSModelConfig()
    rng = jax.random.PRNGKey(args.seed)
    params, state = avs_model.init_avs_model(rng, cfg)
    total, trainable_n, _ = count_params(params)
    print(f"####### Trainable params: {trainable_n * 100 / total:.4f}% #######")

    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        params = ckpt_lib.restore_structure(params, lp)
        if ls is not None:
            state = ckpt_lib.restore_structure(state, ls)
    tr, fr = avs_train.partition_params(params)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
                       accum_steps=1)
    estep = avs_train.make_eval_step(cfg)

    if args.mode == "smoke":
        tx = avs_train.make_optimizer(tr, tcfg, steps_per_epoch=100)
        opt_state = tx.init(tr)
        step = avs_train.make_train_step(cfg, tx, task=args.task, donate=False)
        mask_frames = 1 if args.task == "s4" else cfg.num_frames
        for i in range(args.synthetic_steps):
            b = avs_data.synthetic_batch(args.batch_size, seed=i,
                                         mask_frames=mask_frames)
            batch = {k: jnp.asarray(v) for k, v in b.items()}
            t0 = time.time()
            tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                           jax.random.fold_in(rng, i))
            print(f"step {i}: loss={float(m['loss']):.4f} ({time.time() - t0:.1f}s)")
        b = avs_data.synthetic_batch(1, mask_frames=cfg.num_frames)
        pred = np.asarray(estep(tr, fr, state,
                                {k: jnp.asarray(v) for k, v in b.items()
                                 if k in ("image", "wave")}))
        miou = mask_iou(pred[..., 0], b["mask"][..., 0])
        f = f_measure(pred[..., 0], b["mask"][..., 0])
        print(f"smoke eval: mIoU={miou:.4f} F={f:.4f}")
        return

    if args.mode == "eval":
        test_ds = make_dataset(args, "test", cfg.num_frames, cfg)
        save_dir = (os.path.join(args.save_dir, "pred_masks")
                    if args.save_pred_mask else None)
        miou, f = evaluate(estep, tr, fr, state, test_ds,
                           batch_size=args.batch_size, with_f=True,
                           save_dir=save_dir, num_frames=cfg.num_frames)
        print(f"test mIoU: {miou:.4f}  F-score: {f:.4f}")
        return {"miou": miou, "f_score": f}

    # --- real-data training (avs_s4/train.py:195-345) ---
    train_mask_num = 1 if args.task == "s4" else cfg.num_frames
    train_ds = make_dataset(args, "train", train_mask_num, cfg)
    val_ds = make_dataset(args, "val", cfg.num_frames, cfg)
    if len(val_ds) == 0:
        val_ds = make_dataset(args, "test", cfg.num_frames, cfg)
    steps_per_epoch = max(len(train_ds) // tcfg.batch_size, 1)
    tx = avs_train.make_optimizer(tr, tcfg, steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(tr)
    step = avs_train.make_train_step(cfg, tx, task=args.task, donate=False)

    logger = MetricsLogger(args.save_dir, run_name=f"avs_{args.task}",
                           config=vars(args))
    snapshot_run(args.save_dir, config=vars(args))
    max_miou, stale, best_path, gstep = -1.0, 0, None, 0
    for epoch in range(1, tcfg.epochs + 1):
        for batch in ave_data.batched_iterator(train_ds, tcfg.batch_size,
                                               seed=args.seed + epoch):
            batch = prep_batch(batch, args.task)
            tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                           jax.random.fold_in(rng, gstep))
            if gstep % args.log_every == 0:
                loss = float(m["loss"])
                print(f"epoch {epoch} step {gstep}: loss={loss:.4f}")
                logger.log({"loss": loss}, step=gstep, prefix="train/")
            gstep += 1
        miou = evaluate(estep, tr, fr, state, val_ds, batch_size=args.batch_size)
        print(f"epoch {epoch}: val mIoU {miou:.4f}")
        logger.log({"miou": miou}, step=gstep, prefix="val/")
        if miou > max_miou:
            max_miou, stale = miou, 0
            os.makedirs(args.save_dir, exist_ok=True)
            best_path = os.path.join(args.save_dir, f"{args.task}_best.npz")
            ckpt_lib.save_train_state(
                best_path, params=avs_train.merge_params(tr, fr), state=state,
                opt_state=opt_state, rng_key=rng, step=gstep,
                metadata={"epoch": epoch, "miou": miou})
            print(f"  saved best (mIoU={miou:.4f}) -> {best_path}")
        else:
            stale += 1
            if stale >= args.early_stop:
                print("early stop")
                break

    # final test report with the best checkpoint
    if best_path:
        lp, ls = ckpt_lib.load_params_and_state(best_path)
        params = ckpt_lib.restore_structure(avs_train.merge_params(tr, fr), lp)
        state = ckpt_lib.restore_structure(state, ls)
        tr, fr = avs_train.partition_params(params)
    test_ds = make_dataset(args, "test", cfg.num_frames, cfg)
    result = None
    if len(test_ds):
        miou, f = evaluate(estep, tr, fr, state, test_ds,
                           batch_size=args.batch_size, with_f=True)
        print(f"test mIoU: {miou:.4f}  F-score: {f:.4f}")
        logger.log({"miou": miou, "f_score": f}, step=gstep, prefix="test/")
        result = {"miou": miou, "f_score": f}
    logger.close()
    return result


if __name__ == "__main__":
    main()
