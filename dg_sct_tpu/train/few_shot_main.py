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
from ..utils.compile_cache import enable_persistent_cache
from . import losses
from .pretrain_train import (few_shot_subsample, partition_pretrain_params,
                             soft_cross_entropy)


def few_shot_loss(out, labels, *, epoch, num_frames=10, stage_epochs=4):
    """Staged weighting (main_AVE.py:124-133): w_event 500 -> 5. Weak mode:
    clip-level label, event scores meaned over segments (main_AVE.py:112-115)."""
    ev = out["event_scores"]
    B = labels.shape[0]
    ev = jnp.mean(ev.reshape(B, num_frames, -1), axis=1)
    loss_event = losses.cross_entropy(ev, jnp.argmax(labels, -1))
    eye = jnp.eye(B)
    loss_ai = soft_cross_entropy(out["logits_audio_image"], eye)
    loss_ia = soft_cross_entropy(out["logits_image_audio"], eye)
    w = 500.0 if epoch <= stage_epochs else 5.0
    return w * loss_event + loss_ai + loss_ia


def few_shot_event_loss(out, labels, *, epoch, num_frames=10, stage_epochs=4):
    """Event-localization mode (main_AVE.py:117 non-weak): per-segment soft CE
    against (B, T, n_cls+1) grids; prompt set carries the appended
    'background' class (PromptConfig.weak=False)."""
    labels_bt = labels.reshape(-1, labels.shape[-1])
    loss_event = soft_cross_entropy(out["event_scores"], labels_bt)
    B = labels.shape[0]
    eye = jnp.eye(B)
    loss_ai = soft_cross_entropy(out["logits_audio_image"], eye)
    loss_ia = soft_cross_entropy(out["logits_image_audio"], eye)
    w = 500.0 if epoch <= stage_epochs else 5.0
    return w * loss_event + loss_ai + loss_ia


def make_few_shot_step(cfg, buffers, tx, loss=few_shot_loss):
    import functools

    loss_impl = loss

    @functools.partial(jax.jit, static_argnames=("epoch",))
    def step(trainable, frozen, state, opt_state, batch, rng, epoch=1):
        def loss_fn(tr, st):
            params = dict(frozen)
            params.update(tr)
            out, new_state = PT.forward(params, st, buffers, batch["wave"],
                                        batch["image"], cfg, train=True, rng=rng)
            return loss_impl(out, batch["label"], epoch=epoch,
                             num_frames=cfg.num_frames), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, {"loss": loss}

    return step


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "smoke"], default="smoke")
    p.add_argument("--task", choices=["cls", "events"], default="cls",
                   help="cls: clip classification (main_AVE_class.py / "
                        "main_LLP_class.py); events: AVE per-segment event "
                        "localization (main_AVE.py non-weak)")
    p.add_argument("--k-shot", type=int, default=16)
    p.add_argument("--dataset", choices=["AVE", "LLP"], default="AVE")
    p.add_argument("--meta", default="/root/reference/data/AVE")
    p.add_argument("--label-train", default="/root/reference/data/AVVP/AVVP_train.csv")
    p.add_argument("--label-test", default="/root/reference/data/AVVP/AVVP_test_pd.csv")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save-dir", default="checkpoints/few_shot")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--stage-epochs", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--log-every", type=int, default=10)
    return p.parse_args(argv)


class _Subset:
    def __init__(self, ds, idxs):
        self.ds, self.idxs = ds, list(idxs)

    def __len__(self):
        return len(self.idxs)

    def __getitem__(self, i):
        return self.ds[self.idxs[i]]


def build_datasets(args, cfg):
    """(train K-shot subset, test set, weak-label fn). AVE: clip class = first
    foreground segment's class (few-shot/dataloader.py:119-135); LLP:
    single-label rows only (pretrain/dataloader.py:150-161)."""
    from ..data import ave as ave_data
    from ..data import avvp as avvp_data
    from ..data.vggsound import weak_labels

    kw = dict(frame_dir=args.frames, audio_dir=args.audio,
              img_size=cfg.clip.image_size, num_frames=cfg.num_frames,
              segment_samples=cfg.htsat.frontend.clip_samples)
    if args.dataset == "AVE":
        train = ave_data.AVEDataset(args.meta, "train", **kw)
        test = ave_data.AVEDataset(args.meta, "test", **kw)
        cls_of = [int(np.argmax(weak_labels(train.labels[v][None])[0]))
                  for v in train.ids]
        label_fn = lambda b: weak_labels(b["gt"])
    else:
        train = avvp_data.LLPDataset(args.label_train, st_dir=None, **kw)
        test = avvp_data.LLPDataset(args.label_test, st_dir=None, **kw)
        single = [i for i, (_, t) in enumerate(train.samples) if t.sum() == 1]
        train = _Subset(train, single)
        cls_of = [int(np.argmax(train.ds.samples[i][1])) for i in train.idxs]
        label_fn = lambda b: b["target"]
    keep = few_shot_subsample(np.asarray(cls_of), args.k_shot, seed=args.seed)
    return _Subset(train, keep), test, label_fn


def main(argv=None, cfg: PretrainModelConfig | None = None, classnames=None):
    args = parse_args(argv)
    enable_persistent_cache()
    if args.task == "events":
        assert args.dataset == "AVE", "event localization is the AVE task"
    if cfg is None:
        import dataclasses as _dc

        from ..configs import PromptConfig
        from .zero_shot_main import classnames_for
        names = classnames or classnames_for(args.dataset)
        cfg = PretrainModelConfig(num_classes=len(names))
        if args.task == "events":
            cfg = _dc.replace(cfg, prompt=PromptConfig(weak=False))
    else:
        names = classnames
    assert names is not None and len(names) == cfg.num_classes
    params, state, buffers = PT.init_pretrain_model(jax.random.PRNGKey(args.seed),
                                                    cfg, names)
    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        # partial restore: class-count-dependent entries (clap text features,
        # prompt-learner heads) are skipped when the eval class list differs
        # from the pretrain one (zero_shot.py:92-93 semantics)
        params, skipped = ckpt_lib.restore_matching(params, lp)
        if skipped:
            print(f"ckpt: skipped {len(skipped)} shape-mismatched entries")
        if ls is not None:
            state, _ = ckpt_lib.restore_matching(state, ls)
    tr, fr = partition_pretrain_params(params)
    tx = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                     optax.adam(args.lr))
    opt_state = tx.init(tr)
    step = make_few_shot_step(
        cfg, buffers, tx,
        loss=few_shot_event_loss if args.task == "events" else few_shot_loss)

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

    # --- real K-shot fine-tuning (few-shot/main_AVE.py:96-230) ---
    import os

    from ..data import ave as ave_data
    from ..utils.metrics_log import MetricsLogger
    from .pretrain_train import (make_pretrain_eval_step, segment_accuracy,
                                 weak_accuracy)

    train_ds, test_ds, label_fn = build_datasets(args, cfg)
    if args.task == "events":
        label_fn = lambda b: b["gt"]  # full (B, T, n+1) segment grids
    print(f"{len(train_ds)} K-shot train clips ({args.k_shot}/class), "
          f"{len(test_ds)} test clips")
    estep = make_pretrain_eval_step(cfg, buffers)
    logger = MetricsLogger(args.save_dir, run_name=f"few_shot_{args.dataset}",
                           config=vars(args))
    rng = jax.random.PRNGKey(args.seed)
    best, gstep = -1.0, 0
    for epoch in range(1, args.epochs + 1):
        for batch in ave_data.batched_iterator(train_ds, args.batch_size,
                                               seed=args.seed + epoch,
                                               drop_last=False):
            feed = {"wave": jnp.asarray(batch["wave"]),
                    "image": jnp.asarray(batch["image"]),
                    "label": jnp.asarray(label_fn(batch))}
            tr, state, opt_state, m = step(tr, fr, state, opt_state, feed,
                                           jax.random.fold_in(rng, gstep),
                                           epoch=min(epoch, args.stage_epochs + 1))
            if gstep % args.log_every == 0:
                print(f"epoch {epoch} step {gstep}: loss={float(m['loss']):.2f}")
                logger.log({"loss": float(m["loss"])}, step=gstep, prefix="train/")
            gstep += 1
        accs, n = [], 0
        for batch in ave_data.batched_iterator(test_ds, args.batch_size,
                                               shuffle=False, drop_last=False):
            scores = estep(tr, fr, state, {"wave": jnp.asarray(batch["wave"]),
                                           "image": jnp.asarray(batch["image"])})
            b = len(batch["wave"])
            if args.task == "events":
                accs.append(segment_accuracy(scores, batch["gt"]) * b)
            else:
                accs.append(weak_accuracy(scores, label_fn(batch),
                                          num_frames=cfg.num_frames) * b)
            n += b
        acc = sum(accs) / max(n, 1)
        print(f"epoch {epoch}: test {args.task} accuracy {acc:.2f} %")
        logger.log({"cls_acc": acc}, step=gstep, prefix="test/")
        if acc >= best:
            best = acc
            os.makedirs(args.save_dir, exist_ok=True)
            ckpt_lib.save_train_state(
                os.path.join(args.save_dir, f"few_shot_{args.dataset}_{args.task}_best.npz"),
                params=dict(fr, **tr), state=state, opt_state=opt_state,
                rng_key=rng, step=gstep, metadata={"epoch": epoch, "acc": acc})
    logger.close()
    return best


if __name__ == "__main__":
    main()
