"""AVS training/eval driver — the `avs_scripts/avs_s4/train.py` equivalent
(S4 and MS3 via --task).

Usage:
    python -m dg_sct_tpu.train.avs_main --mode smoke --task s4
    python -m dg_sct_tpu.train.avs_main --mode train --root AVSBench_dir
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVSModelConfig, TrainConfig
from ..data import avs as avs_data
from ..models import avs as avs_model
from . import avs_train
from .metrics import f_measure, mask_iou


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--task", choices=["s4", "ms3"], default="s4")
    p.add_argument("--root", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--synthetic-steps", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = AVSModelConfig()
    rng = jax.random.PRNGKey(args.seed)
    params, state = avs_model.init_avs_model(rng, cfg)
    tr, fr = avs_train.partition_params(params)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
                       accum_steps=1)
    tx = avs_train.make_optimizer(tr, tcfg, steps_per_epoch=100)
    opt_state = tx.init(tr)
    step = avs_train.make_train_step(cfg, tx, task=args.task, donate=False)
    estep = avs_train.make_eval_step(cfg)

    if args.mode == "smoke":
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
                                {k: jnp.asarray(v) for k, v in b.items()}))
        miou = mask_iou(pred[..., 0], b["mask"][..., 0])
        f = f_measure(pred[..., 0], b["mask"][..., 0])
        print(f"smoke eval: mIoU={miou:.4f} F={f:.4f}")
        return

    raise SystemExit("real-data training requires --root with AVSBench media")


if __name__ == "__main__":
    main()
