"""AVQA two-stage driver — `grounding_gen/main_grd_gen.py` +
`net_grd_avst/main_avst.py` equivalents.

Stage 1 trains the audio-visual grounding match classifier on pos/neg frame
pairs and saves its weights; stage 2 key-transfers them into the fusion net
(main_avst.py:252-263), trains with CE(qa) + 0.5*CE(match), and the test
report prints the reference's 9 per-question-type accuracies
(main_avst.py:141-222).

Usage:
    python -m dg_sct_tpu.train.avqa_main --mode smoke
    python -m dg_sct_tpu.train.avqa_main --mode train --stage 1 --meta M \
        --frames DIR --audio DIR
    python -m dg_sct_tpu.train.avqa_main --mode train --stage 2 --meta M \
        --frames DIR --audio DIR [--stage1-ckpt ck.npz]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import AVQAModelConfig, TrainConfig
from ..data import ave as ave_data
from ..data import avqa as avqa_data
from ..models import avqa as avqa_model
from ..models import avqa_grounding
from ..utils import checkpoint as ckpt_lib
from ..utils.compile_cache import enable_persistent_cache
from ..utils.metrics_log import MetricsLogger, snapshot_run
from . import avqa_train, losses
from .ave_train import merge_params, partition_params
from .optim import count_params


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval", "smoke"], default="smoke")
    p.add_argument("--stage", type=int, choices=[1, 2], default=2)
    p.add_argument("--meta", default="/root/reference/data/AVQA")
    p.add_argument("--train-json", default=None, help="default <meta>/avqa-train.json")
    p.add_argument("--val-json", default=None)
    p.add_argument("--test-json", default=None)
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--stage1-ckpt", default=None)
    p.add_argument("--save-dir", default="checkpoints/avqa")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--log-every", type=int, default=50)
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


def make_dataset(args, split_json, cfg: AVQAModelConfig, seed=0):
    return avqa_data.AVQADataset(
        args.meta, split_json, frame_dir=args.frames, audio_dir=args.audio,
        img_size=cfg.swin.img_size, num_frames=cfg.num_frames,
        segment_samples=cfg.htsat.frontend.clip_samples, seed=seed)


def _json_path(args, name, override):
    if override:
        return override
    # The shipped reference metadata keeps the splits under <meta>/json/
    # (AVQA/net_grd_avst/main_avst.py defaults); probe both layouts, matching
    # the AVQADataset vocab fallback.
    for cand in (os.path.join(args.meta, "json", f"avqa-{name}.json"),
                 os.path.join(args.meta, f"avqa-{name}.json")):
        if os.path.exists(cand):
            return cand
    return os.path.join(args.meta, f"avqa-{name}.json")


def feed_of(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


def evaluate_stage2(estep, tr, fr, state, dataset, *, batch_size=2, logger=None,
                    step=0, tag="val"):
    """Accuracy + the 9 per-question-type accuracies (main_avst.py:141-222)."""
    types, correct = [], []
    for batch in ave_data.batched_iterator(dataset, batch_size, shuffle=False,
                                           drop_last=False):
        out_qa = np.asarray(estep(tr, fr, state, feed_of(batch)))
        pred = out_qa.argmax(-1)
        correct.extend((pred == batch["answer"]).tolist())
        types.extend(batch.get("type", [""] * len(pred)))
    accs = avqa_data.question_type_accuracies(types, correct)
    for k in sorted(accs):
        print(f"  {tag} {k} accuracy: {accs[k]:.2f} %")
    if logger is not None:
        logger.log(accs, step=step, prefix=f"{tag}/")
    return accs


# --------------------------- stage 1 ---------------------------

def make_stage1_steps(cfg: AVQAModelConfig, tx):
    import functools

    def loss_of(params, st, batch, rng, train):
        visual = jnp.stack([batch["visual_posi"][:, 0], batch["visual_nega"][:, 0]],
                           axis=1)                       # (B, 2, H, W, 3)
        logits, new_state = avqa_grounding.forward(
            params, st, batch["wave"], visual, cfg, train=train, rng=rng)
        B = batch["wave"].shape[0]
        labels = jnp.tile(jnp.asarray([1, 0], jnp.int32), B)[: logits.shape[0]]
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return losses.cross_entropy(logits, labels), (acc, new_state)

    @functools.partial(jax.jit, donate_argnums=())
    def train_step(trainable, frozen, st, opt_state, batch, rng):
        def fn(tr):
            params = merge_params(tr, frozen)
            return loss_of(params, st, batch, rng, True)
        (loss, (acc, new_state)), grads = jax.value_and_grad(fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, {"loss": loss, "acc": acc}

    @jax.jit
    def eval_step(trainable, frozen, st, batch):
        params = merge_params(trainable, frozen)
        loss, (acc, _) = loss_of(params, st, batch, None, False)
        return {"loss": loss, "acc": acc}

    return train_step, eval_step


def run_stage1(args, cfg, rng):
    params, state = avqa_grounding.init_grounding_model(rng, cfg)
    tr, fr = partition_params(params)
    tx = optax.adam(args.lr)
    opt_state = tx.init(tr)
    step, estep = make_stage1_steps(cfg, tx)

    train_ds = make_dataset(args, _json_path(args, "train", args.train_json), cfg,
                            seed=args.seed)
    val_ds = make_dataset(args, _json_path(args, "val", args.val_json), cfg)
    logger = MetricsLogger(args.save_dir, run_name="avqa_grd", config=vars(args))
    best, best_path, gstep = -1.0, None, 0
    for epoch in range(1, args.epochs + 1):
        for batch in ave_data.batched_iterator(train_ds, args.batch_size,
                                               seed=args.seed + epoch):
            tr, state, opt_state, m = step(tr, fr, state, opt_state,
                                           feed_of(batch),
                                           jax.random.fold_in(rng, gstep))
            if gstep % args.log_every == 0:
                print(f"epoch {epoch} step {gstep}: loss={float(m['loss']):.4f} "
                      f"acc={float(m['acc']):.3f}")
                logger.log({"loss": float(m["loss"]), "acc": float(m["acc"])},
                           step=gstep, prefix="train/")
            gstep += 1
        accs = []
        for batch in ave_data.batched_iterator(val_ds, args.batch_size,
                                               shuffle=False, drop_last=False):
            accs.append(float(estep(tr, fr, state, feed_of(batch))["acc"]))
        acc = 100.0 * float(np.mean(accs)) if accs else 0.0
        print(f"epoch {epoch}: val match acc {acc:.2f} %")
        logger.log({"match_acc": acc}, step=gstep, prefix="val/")
        if acc >= best:
            best = acc
            os.makedirs(args.save_dir, exist_ok=True)
            best_path = os.path.join(args.save_dir, "grounding_gen_best.npz")
            ckpt_lib.save_train_state(
                best_path, params=merge_params(tr, fr), state=state,
                opt_state=opt_state, rng_key=rng, step=gstep,
                metadata={"epoch": epoch, "match_acc": acc})
            print(f"  saved best -> {best_path}")
    logger.close()
    return best_path


# --------------------------- stage 2 ---------------------------

def run_stage2(args, cfg, rng):
    params, state = avqa_model.init_avqa_model(rng, cfg)
    if args.stage1_ckpt:
        s1, _ = ckpt_lib.load_params_and_state(args.stage1_ckpt)
        params = transfer_stage1(params, s1)
        print(f"transferred stage-1 heads from {args.stage1_ckpt}")
    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        params = ckpt_lib.restore_structure(params, lp)
        if ls is not None:
            state = ckpt_lib.restore_structure(state, ls)
    tr, fr = avqa_train.partition_params(params)
    total, trainable_n, _ = count_params(params)
    print(f"####### Trainable params: {trainable_n * 100 / total:.4f}% #######")

    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                       epochs=args.epochs, accum_steps=1)
    estep = avqa_train.make_eval_step(cfg)

    if args.mode == "eval":
        test_ds = make_dataset(args, _json_path(args, "test", args.test_json), cfg)
        return evaluate_stage2(estep, tr, fr, state, test_ds,
                               batch_size=args.batch_size, tag="test")

    train_ds = make_dataset(args, _json_path(args, "train", args.train_json), cfg,
                            seed=args.seed)
    val_ds = make_dataset(args, _json_path(args, "val", args.val_json), cfg)
    steps_per_epoch = max(len(train_ds) // tcfg.batch_size, 1)
    tx = avqa_train.make_optimizer(tr, tcfg, steps_per_epoch=steps_per_epoch)
    opt_state = tx.init(tr)
    step = avqa_train.make_train_step(cfg, tx, donate=False)

    logger = MetricsLogger(args.save_dir, run_name="avqa", config=vars(args))
    snapshot_run(args.save_dir, config=vars(args))
    best, best_path, gstep = -1.0, None, 0
    for epoch in range(1, tcfg.epochs + 1):
        for batch in ave_data.batched_iterator(train_ds, tcfg.batch_size,
                                               seed=args.seed + epoch):
            tr, state, opt_state, m = step(tr, fr, state, opt_state,
                                           feed_of(batch),
                                           jax.random.fold_in(rng, gstep))
            if gstep % args.log_every == 0:
                print(f"epoch {epoch} step {gstep}: loss={float(m['loss']):.4f} "
                      f"qa_acc={float(m['qa_acc']):.3f}")
                logger.log({"loss": float(m["loss"]),
                            "qa_acc": float(m["qa_acc"])},
                           step=gstep, prefix="train/")
            gstep += 1
        accs = evaluate_stage2(estep, tr, fr, state, val_ds,
                               batch_size=args.batch_size, logger=logger,
                               step=gstep)
        acc = accs["Avg"]
        if acc >= best:
            best = acc
            os.makedirs(args.save_dir, exist_ok=True)
            best_path = os.path.join(args.save_dir, "avst_best.npz")
            ckpt_lib.save_train_state(
                best_path, params=avqa_train.merge_params(tr, fr), state=state,
                opt_state=opt_state, rng_key=rng, step=gstep,
                metadata={"epoch": epoch, "acc": acc})
            print(f"  saved best (acc={acc:.2f}) -> {best_path}")

    if best_path:
        lp, ls = ckpt_lib.load_params_and_state(best_path)
        params = ckpt_lib.restore_structure(avqa_train.merge_params(tr, fr), lp)
        state = ckpt_lib.restore_structure(state, ls)
        tr, fr = avqa_train.partition_params(params)
    test_ds = make_dataset(args, _json_path(args, "test", args.test_json), cfg)
    accs = evaluate_stage2(estep, tr, fr, state, test_ds,
                           batch_size=args.batch_size, logger=logger,
                           step=gstep, tag="test")
    logger.close()
    return accs


def main(argv=None, cfg: AVQAModelConfig | None = None):
    args = parse_args(argv)
    enable_persistent_cache()
    cfg = cfg or AVQAModelConfig()
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
            s1, _ = ckpt_lib.load_params_and_state(args.stage1_ckpt)
            params = transfer_stage1(params, s1)
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

    if args.stage == 1:
        return run_stage1(args, cfg, rng)
    return run_stage2(args, cfg, rng)


if __name__ == "__main__":
    main()
