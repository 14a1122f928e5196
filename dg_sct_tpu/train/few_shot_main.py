"""Few-shot fine-tuning driver — the `few-shot/main_AVE*.py` equivalents.

Fine-tunes the pretrain CLIP x CLAP model on K examples per class
(few-shot/dataloader.py:97-170 subsampling) with the reference's staged loss
weighting (main_AVE.py:124-133: event loss upweighted 500x for the first
epochs, 5x after) and gradient clipping (main_AVE.py:151-152).

Usage:
    python -m dg_sct_tpu.train.few_shot_main --mode smoke --k-shot 2
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import PretrainModelConfig, TrainConfig
from ..models import pretrain as PT
from ..utils import checkpoint as ckpt_lib
from . import losses
from .pretrain_train import (few_shot_subsample, partition_pretrain_params,
                             soft_cross_entropy)


def few_shot_loss(out, labels, *, epoch, num_frames=10, stage_epochs=4):
    """Staged weighting (main_AVE.py:124-133): w_event 500 -> 5."""
    ev = out["event_scores"]
    B = labels.shape[0]
    ev = jnp.mean(ev.reshape(B, num_frames, -1), axis=1)
    loss_event = losses.cross_entropy(ev, jnp.argmax(labels, -1))
    eye = jnp.eye(B)
    loss_ai = soft_cross_entropy(out["logits_audio_image"], eye)
    loss_ia = soft_cross_entropy(out["logits_image_audio"], eye)
    w = 500.0 if epoch <= stage_epochs else 5.0
    return w * loss_event + loss_ai + loss_ia


def make_few_shot_step(cfg, buffers, tx):
    import functools

    @functools.partial(jax.jit, static_argnames=("epoch",))
    def step(trainable, frozen, state, opt_state, batch, rng, epoch=1):
        def loss_fn(tr, st):
            params = dict(frozen)
            params.update(tr)
            out, new_state = PT.forward(params, st, buffers, batch["wave"],
                                        batch["image"], cfg, train=True, rng=rng)
            return few_shot_loss(out, batch["label"], epoch=epoch,
                                 num_frames=cfg.num_frames), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, {"loss": loss}

    return step


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "smoke"], default="smoke")
    p.add_argument("--k-shot", type=int, default=16)
    p.add_argument("--dataset", choices=["AVE", "LLP"], default="AVE")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=43)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from .zero_shot_main import classnames_for
    names = classnames_for(args.dataset)
    cfg = PretrainModelConfig(num_classes=len(names))
    params, state, buffers = PT.init_pretrain_model(jax.random.PRNGKey(args.seed),
                                                    cfg, names)
    if args.ckpt:
        loaded = ckpt_lib.load_params(args.ckpt)
        params = ckpt_lib.restore_structure(params, loaded.get("params", loaded))
    tr, fr = partition_pretrain_params(params)
    tx = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                     optax.adam(args.lr))
    opt_state = tx.init(tr)
    step = make_few_shot_step(cfg, buffers, tx)

    if args.mode == "smoke":
        B, T = 2, 2
        cfg2 = PretrainModelConfig(num_classes=len(names), num_frames=T)
        step = make_few_shot_step(cfg2, buffers, tx)
        rs = np.random.RandomState(0)
        labels = np.eye(len(names), dtype=np.float32)[rs.randint(len(names), size=B)]
        batch = {
            "wave": jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32)),
            "image": jnp.asarray(rs.rand(B, T, 224, 224, 3).astype(np.float32)),
            "label": jnp.asarray(labels),
        }
        t0 = time.time()
        tr, state, opt_state, m = step(tr, fr, state, opt_state, batch,
                                       jax.random.PRNGKey(1), epoch=1)
        print(f"few-shot smoke: loss={float(m['loss']):.2f} ({time.time() - t0:.0f}s)")
        # demonstrate the K-shot sampler on synthetic labels
        fake = np.repeat(np.arange(len(names)), 20)
        keep = few_shot_subsample(fake, args.k_shot, seed=args.seed)
        assert len(keep) == args.k_shot * len(names)
        print(f"k-shot sampler: kept {len(keep)} of {len(fake)}")
        return

    raise SystemExit("real few-shot training requires decoded media dirs")


if __name__ == "__main__":
    main()
