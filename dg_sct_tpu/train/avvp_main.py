"""AVVP training/eval driver — the `DG-SCT/AVVP/main.py` equivalent.

Full real-data loops mirroring the reference: epoch training over
`AVVP_train.csv` media, per-epoch F1 eval (batch 1) against
`AVVP_eval_audio/visual.csv` temporal annotations, best-checkpoint selection
on segment-level Type@Avg F1 (main.py:374-381), and final test-split report
(main.py:384-390).

Usage:
    python -m dg_sct_tpu.train.avvp_main --mode smoke
    python -m dg_sct_tpu.train.avvp_main --mode train --frames DIR --audio DIR \
        --st DIR [--eval-csv-dir .../data/AVVP]
    python -m dg_sct_tpu.train.avvp_main --mode eval --ckpt best.npz ...
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVVPModelConfig, TrainConfig
from ..data import ave as ave_data
from ..data import avvp as avvp_data
from ..models import avvp as avvp_model
from ..utils import checkpoint as ckpt_lib
from ..utils.compile_cache import enable_persistent_cache
from ..utils.metrics_log import MetricsLogger, snapshot_run
from . import avvp_eval, avvp_train
from .optim import count_params


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--label-train", default="/root/reference/data/AVVP/AVVP_train.csv")
    p.add_argument("--label-val", default="/root/reference/data/AVVP/AVVP_val_pd.csv")
    p.add_argument("--label-test", default="/root/reference/data/AVVP/AVVP_test_pd.csv")
    p.add_argument("--eval-csv-dir", default="/root/reference/data/AVVP")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--st", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save-dir", default="checkpoints/avvp")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--synthetic-steps", type=int, default=2)
    return p.parse_args(argv)


def make_dataset(args, label_csv, cfg: AVVPModelConfig):
    return avvp_data.LLPDataset(
        label_csv, frame_dir=args.frames, audio_dir=args.audio, st_dir=args.st,
        img_size=cfg.swin.img_size, num_frames=cfg.num_frames,
        segment_samples=cfg.htsat.frontend.clip_samples)


def evaluate(estep, tr, fr, state, dataset, eval_csv_dir, *, logger=None,
             step=0, tag="val", num_segments=10):
    """Batch-1 F1 eval over a split (main.py:88-200). Returns the summary dict;
    best-model criterion is `segment_type_avg`."""
    ann_a = avvp_data.parse_eval_csv(
        os.path.join(eval_csv_dir, "AVVP_eval_audio.csv"), num_segments)
    ann_v = avvp_data.parse_eval_csv(
        os.path.join(eval_csv_dir, "AVVP_eval_visual.csv"), num_segments)
    empty = np.zeros((len(avvp_data.CATEGORIES), num_segments), np.int64)
    per_video = []
    for batch in ave_data.batched_iterator(dataset, 1, shuffle=False,
                                           drop_last=False):
        vid = batch.pop("video")[0] if "video" in batch else None
        out = estep(tr, fr, state,
                    {k: jnp.asarray(v) for k, v in batch.items()
                     if isinstance(v, np.ndarray)})
        per_video.append(avvp_eval.evaluate_video(
            out, ann_a.get(vid, empty), ann_v.get(vid, empty)))
    summary = avvp_eval.summarize(per_video)
    if logger is not None:
        logger.log(summary, step=step, prefix=f"{tag}/")
    for k, v in summary.items():
        print(f"  {tag} {k}: {v:.1f}")
    return summary


def main(argv=None, cfg: AVVPModelConfig | None = None):
    args = parse_args(argv)
    enable_persistent_cache()
    cfg = cfg or AVVPModelConfig()
    rng = jax.random.PRNGKey(args.seed)
    params, state = avvp_model.init_avvp_model(rng, cfg)

    total, trainable_n, frozen_n = count_params(params)
    print(f"####### Trainable params: {trainable_n * 100 / total:.4f}% #######")

    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        params = ckpt_lib.restore_structure(params, lp)
        if ls is not None:
            state = ckpt_lib.restore_structure(state, ls)
    tr, fr = avvp_train.partition_params(params)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
                       accum_steps=1)
    estep = avvp_train.make_eval_step(cfg)

    if args.mode == "smoke":
        tx = avvp_train.make_optimizer(tr, tcfg, steps_per_epoch=100)
        opt_state = tx.init(tr)
        step = avvp_train.make_train_step(cfg, tx, donate=False)
        for i in range(args.synthetic_steps):
            batch = {k: jnp.asarray(v) for k, v in
                     avvp_data.synthetic_batch(args.batch_size, seed=i).items()}
            t0 = time.time()
            tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                           jax.random.fold_in(rng, i))
            print(f"step {i}: loss={float(m['loss']):.4f} ({time.time() - t0:.1f}s)")
        out = estep(tr, fr, state, {k: jnp.asarray(v) for k, v in
                                    avvp_data.synthetic_batch(1).items()})
        scores = avvp_eval.evaluate_video(
            out, np.zeros((25, 10), np.int64), np.zeros((25, 10), np.int64))
        print("smoke eval:", {k: round(v, 3) for k, v in scores.items()})
        return

    if args.mode == "eval":
        test_ds = make_dataset(args, args.label_test, cfg)
        return evaluate(estep, tr, fr, state, test_ds, args.eval_csv_dir,
                        tag="test", num_segments=cfg.num_frames)

    # --- real-data training (main.py:358-390) ---
    train_ds = make_dataset(args, args.label_train, cfg)
    val_ds = make_dataset(args, args.label_val, cfg)
    steps_per_epoch = max(len(train_ds) // tcfg.batch_size, 1)
    tx = avvp_train.make_optimizer(tr, tcfg, steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(tr)
    step = avvp_train.make_train_step(cfg, tx, donate=False)

    logger = MetricsLogger(args.save_dir, run_name="avvp", config=vars(args))
    snapshot_run(args.save_dir, config=vars(args))
    best_F, best_path = -1.0, None
    gstep = 0
    for epoch in range(1, tcfg.epochs + 1):
        for batch in ave_data.batched_iterator(train_ds, tcfg.batch_size,
                                               seed=args.seed + epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if isinstance(v, np.ndarray)}
            tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                           jax.random.fold_in(rng, gstep))
            if gstep % args.log_every == 0:
                loss = float(m["loss"])
                print(f"epoch {epoch} step {gstep}: loss={loss:.4f}")
                logger.log({"loss": loss}, step=gstep, prefix="train/")
            gstep += 1
        summary = evaluate(estep, tr, fr, state, val_ds, args.eval_csv_dir,
                           logger=logger, step=gstep, num_segments=cfg.num_frames)
        F = summary["segment_type_avg"]
        if F >= best_F:
            best_F = F
            os.makedirs(args.save_dir, exist_ok=True)
            best_path = os.path.join(args.save_dir, "MGN_Net.npz")
            ckpt_lib.save_train_state(
                best_path, params=avvp_train.merge_params(tr, fr), state=state,
                opt_state=opt_state, rng_key=rng, step=gstep,
                metadata={"epoch": epoch, "segment_type_avg": F})
            print(f"  saved best (F={F:.2f}) -> {best_path}")

    # final test with the best checkpoint (main.py:384-390)
    if best_path:
        lp, ls = ckpt_lib.load_params_and_state(best_path)
        params = ckpt_lib.restore_structure(avvp_train.merge_params(tr, fr), lp)
        state = ckpt_lib.restore_structure(state, ls)
        tr, fr = avvp_train.partition_params(params)
    test_ds = make_dataset(args, args.label_test, cfg)
    summary = evaluate(estep, tr, fr, state, test_ds, args.eval_csv_dir,
                       logger=logger, step=gstep, tag="test",
                       num_segments=cfg.num_frames)
    logger.close()
    return summary


if __name__ == "__main__":
    main()
