"""AVE training/eval driver — the `DG-SCT/AVE/main_trans.py` equivalent.

Usage:
    python -m dg_sct_tpu.train.ave_main --mode train --frames DIR --audio DIR \
        --meta /path/to/AVE --save-dir ckpts/
    python -m dg_sct_tpu.train.ave_main --mode eval --ckpt ckpts/best.npz ...

Improvements over the reference driver (deliberate):
  * full train-state checkpoints (optimizer + RNG + step) with resume;
  * mesh-sharded data parallelism instead of single-GPU;
  * param-group accounting identical to main_trans.py:271-273.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVEModelConfig, TrainConfig
from ..data import ave as ave_data
from ..models import ave as ave_model
from ..parallel import mesh as M
from ..utils import checkpoint as ckpt_lib
from ..utils.compile_cache import enable_persistent_cache
from ..utils.metrics_log import MetricsLogger, snapshot_run
from . import ave_train
from .optim import count_params


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--meta", default="/root/reference/data/AVE")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--early-stop", type=int, default=10)
    p.add_argument("--synthetic-steps", type=int, default=2)
    return p.parse_args(argv)


def evaluate(eval_step, tr, fr, state, batches):
    accs, n = [], 0
    for batch in batches:
        m = eval_step(tr, fr, state, {k: jnp.asarray(v) for k, v in batch.items()})
        accs.append(float(m["correct_frac"]) * batch["gt"].shape[0])
        n += batch["gt"].shape[0]
    return 100.0 * sum(accs) / max(n, 1)


def main(argv=None, cfg: AVEModelConfig | None = None):
    args = parse_args(argv)
    enable_persistent_cache()
    cfg = cfg or AVEModelConfig()
    tcfg = TrainConfig(batch_size=args.batch_size, accum_steps=args.accum,
                       lr=args.lr, epochs=args.epochs, seed=args.seed,
                       early_stop=args.early_stop)

    rng = jax.random.PRNGKey(tcfg.seed)
    params, state = ave_model.init_ave_model(rng, cfg)
    tr, fr = ave_train.partition_params(params)

    total, trainable, frozen = count_params(params)
    print(f"####### Trainable params: {trainable * 100 / total:.4f}% #######")
    print(f"####### Additional params: {trainable * 100 / frozen:.4f}% #######")
    print(f"####### Total params in M: {total / 1e6:.1f} M #######")

    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        params = ckpt_lib.restore_structure(params, lp)
        if ls is not None:
            state = ckpt_lib.restore_structure(state, ls)
        tr, fr = ave_train.partition_params(params)

    if args.mode == "smoke":
        # synthetic end-to-end smoke: a couple of train steps + one eval
        tx = ave_train.make_optimizer(tr, tcfg, steps_per_epoch=args.synthetic_steps)
        opt_state = tx.init(tr)
        step = ave_train.make_train_step(cfg, tx, donate=False)
        estep = ave_train.make_eval_step(cfg)
        for i in range(args.synthetic_steps):
            batch = ave_data.synthetic_batch(args.batch_size, seed=i)
            batch["mixup_lambda"] = np.random.RandomState(i).beta(
                0.5, 0.5, size=(args.batch_size * cfg.num_frames,)).astype(np.float32)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            t0 = time.time()
            tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                           jax.random.fold_in(rng, i))
            print(f"step {i}: loss={float(m['loss']):.4f} acc={float(m['acc']):.2f} "
                  f"({time.time() - t0:.1f}s)")
        eb = {k: jnp.asarray(v) for k, v in ave_data.synthetic_batch(args.batch_size).items()}
        m = estep(tr, fr, state, eb)
        print(f"eval correct_frac={float(m['correct_frac']):.4f}")
        return

    ds_kw = dict(frame_dir=args.frames, audio_dir=args.audio,
                 img_size=cfg.swin.img_size, num_frames=cfg.num_frames,
                 segment_samples=cfg.htsat.frontend.clip_samples)
    train_ds = ave_data.AVEDataset(args.meta, "train", **ds_kw)
    test_ds = ave_data.AVEDataset(args.meta, "test", **ds_kw)
    steps_per_epoch = len(train_ds) // tcfg.batch_size
    tx = ave_train.make_optimizer(tr, tcfg, steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(tr)
    step = ave_train.make_train_step(cfg, tx, donate=False)
    estep = ave_train.make_eval_step(cfg)

    if args.mode == "eval":
        acc = evaluate(estep, tr, fr, state,
                       ave_data.batched_iterator(test_ds, 4, shuffle=False))
        print(f"val acc: {acc:.2f}")
        return

    mesh = M.make_data_mesh_for(tcfg.batch_size)
    logger = MetricsLogger(args.save_dir, run_name="ave", config=vars(args))
    snapshot_run(args.save_dir, config=vars(args))
    best, stale = 0.0, 0
    for epoch in range(1, tcfg.epochs + 1):
        for i, batch in enumerate(ave_data.batched_iterator(
                train_ds, tcfg.batch_size, seed=tcfg.seed + epoch)):
            batch["mixup_lambda"] = np.random.beta(
                0.5, 0.5, size=(batch["gt"].shape[0] * cfg.num_frames,)).astype(np.float32)
            batch = M.shard_batch(batch, mesh)
            tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                           jax.random.fold_in(rng, epoch * 100000 + i))
            if i % 50 == 0:
                print(f"epoch {epoch} step {i}: loss={float(m['loss']):.4f}")
                logger.log({"loss": float(m["loss"]), "acc": float(m["acc"])},
                           step=(epoch - 1) * steps_per_epoch + i, prefix="train/")
        acc = evaluate(estep, tr, fr, state,
                       ave_data.batched_iterator(test_ds, tcfg.batch_size, shuffle=False))
        print(f"epoch {epoch}: val acc {acc:.2f}")
        logger.log({"acc": acc}, step=epoch * steps_per_epoch, prefix="val/")
        if acc >= best:
            best, stale = acc, 0
            os.makedirs(args.save_dir, exist_ok=True)
            ckpt_lib.save_train_state(
                os.path.join(args.save_dir, f"best_{acc:.2f}.npz"),
                params=ave_train.merge_params(tr, fr), state=state,
                opt_state=opt_state, rng_key=rng, step=epoch * steps_per_epoch,
                metadata={"epoch": epoch, "acc": acc})
        else:
            stale += 1
            if stale >= tcfg.early_stop:
                print("early stop")
                break


if __name__ == "__main__":
    main()
