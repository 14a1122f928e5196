"""Pretrain driver — the `pretrain/main_trans.py` equivalent.

Trains the CLIP x CLAP prompt-adapter model on VGGSound-AVEL-40K with the
reference's dynamically-weighted loss (CE event + symmetric AV contrastive,
main_trans.py:113-137), evaluates weak clip-classification accuracy per epoch
(main_trans.py:181-215), and saves the best checkpoint — the artifact the
few-shot / zero-shot drivers consume.

Usage:
    python -m dg_sct_tpu.train.pretrain_main --mode smoke
    python -m dg_sct_tpu.train.pretrain_main --mode train --root VGG_META \
        --frames DIR --audio DIR [--shot K]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import PretrainModelConfig
from ..data import ave as ave_data
from ..data import vggsound as vgg_data
from ..models import pretrain as PT
from ..utils import checkpoint as ckpt_lib
from ..utils.compile_cache import enable_persistent_cache
from ..utils.metrics_log import MetricsLogger, snapshot_run
from .pretrain_train import (make_pretrain_eval_step, make_pretrain_step,
                             partition_pretrain_params, weak_accuracy)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--root", default=None, help="VGGSound-AVEL meta dir "
                   "(labels csv + categories txt)")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save-dir", default="checkpoints/pretrain")
    p.add_argument("--shot", type=int, default=0, help="K-shot subsampling "
                   "(pretrain/dataloader.py:99-110); 0 = full set")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--log-every", type=int, default=50)
    return p.parse_args(argv)


def make_dataset(args, split, cfg: PretrainModelConfig):
    return vgg_data.VGGSoundAVELDataset(
        args.root, split, frame_dir=args.frames, audio_dir=args.audio,
        img_size=cfg.clip.image_size, num_frames=cfg.num_frames,
        segment_samples=cfg.htsat.frontend.clip_samples, shot=args.shot)


def evaluate(estep, tr, fr, state, dataset, num_frames, *, batch_size=8):
    accs, n = [], 0
    for batch in ave_data.batched_iterator(dataset, batch_size, shuffle=False,
                                           drop_last=False):
        scores = estep(tr, fr, state,
                       {"wave": jnp.asarray(batch["wave"]),
                        "image": jnp.asarray(batch["image"])})
        wl = vgg_data.weak_labels(batch["gt"])
        b = len(batch["gt"])
        accs.append(weak_accuracy(scores, wl, num_frames=num_frames) * b)
        n += b
    return sum(accs) / max(n, 1)


def main(argv=None, cfg: PretrainModelConfig | None = None, classnames=None):
    args = parse_args(argv)
    enable_persistent_cache()
    if cfg is None:
        classnames = classnames or (
            vgg_data.load_categories(os.path.join(
                args.root, "VggsoundAVEL40kCategories.txt")) if args.root else
            [f"class {i}" for i in range(PretrainModelConfig().num_classes)])
        cfg = PretrainModelConfig(num_classes=len(classnames))
    assert classnames is not None and len(classnames) == cfg.num_classes
    rng = jax.random.PRNGKey(args.seed)
    params, state, buffers = PT.init_pretrain_model(rng, cfg, classnames)
    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        params = ckpt_lib.restore_structure(params, lp)
        if ls is not None:
            state = ckpt_lib.restore_structure(state, ls)
    tr, fr = partition_pretrain_params(params)
    tx = optax.adam(args.lr)
    opt_state = tx.init(tr)
    step = make_pretrain_step(cfg, buffers, tx)
    estep = make_pretrain_eval_step(cfg, buffers)

    if args.mode == "smoke":
        rs = np.random.RandomState(0)
        B, T = 2, cfg.num_frames
        labels = np.eye(cfg.num_classes, dtype=np.float32)[
            rs.randint(cfg.num_classes, size=B)]
        batch = {
            "wave": jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples)
                                .astype(np.float32)),
            "image": jnp.asarray(rs.rand(B, T, cfg.clip.image_size,
                                         cfg.clip.image_size, 3)
                                 .astype(np.float32)),
            "label": jnp.asarray(labels),
        }
        t0 = time.time()
        tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                       jax.random.PRNGKey(1), epoch=1)
        print(f"pretrain smoke: loss={float(m['loss']):.4f} "
              f"({time.time() - t0:.1f}s)")
        return

    if args.mode == "eval":
        test_ds = make_dataset(args, "test", cfg)
        acc = evaluate(estep, tr, fr, state, test_ds, cfg.num_frames,
                       batch_size=args.batch_size)
        print(f"test weak accuracy: {acc:.2f} %")
        return acc

    # --- real-data training (main_trans.py:104-160) ---
    train_ds = make_dataset(args, "train", cfg)
    test_ds = make_dataset(args, "test", cfg)
    print(f"{len(train_ds)} train / {len(test_ds)} test clips, "
          f"{cfg.num_classes} classes")
    logger = MetricsLogger(args.save_dir, run_name="pretrain", config=vars(args))
    snapshot_run(args.save_dir, config=vars(args))
    best, best_path, gstep = -1.0, None, 0
    for epoch in range(1, args.epochs + 1):
        for batch in ave_data.batched_iterator(train_ds, args.batch_size,
                                               seed=args.seed + epoch):
            feed = {
                "wave": jnp.asarray(batch["wave"]),
                "image": jnp.asarray(batch["image"]),
                "label": jnp.asarray(vgg_data.weak_labels(batch["gt"])),
            }
            tr, state, opt_state, m = step(tr, fr, state, opt_state, feed,
                                           jax.random.fold_in(rng, gstep),
                                           epoch=epoch)
            if gstep % args.log_every == 0:
                print(f"epoch {epoch} step {gstep}: loss={float(m['loss']):.4f}")
                logger.log({"loss": float(m["loss"])}, step=gstep, prefix="train/")
            gstep += 1
        acc = evaluate(estep, tr, fr, state, test_ds, cfg.num_frames,
                       batch_size=args.batch_size)
        print(f"epoch {epoch}: weak accuracy {acc:.2f} %")
        logger.log({"weak_acc": acc}, step=gstep, prefix="val/")
        if acc >= best:
            best = acc
            os.makedirs(args.save_dir, exist_ok=True)
            best_path = os.path.join(args.save_dir, "pretrain_best.npz")
            ckpt_lib.save_train_state(
                best_path, params=dict(fr, **tr), state=state,
                opt_state=opt_state, rng_key=rng, step=gstep,
                metadata={"epoch": epoch, "weak_acc": acc})
            print(f"  saved best -> {best_path}")
    logger.close()
    return best_path


if __name__ == "__main__":
    main()
