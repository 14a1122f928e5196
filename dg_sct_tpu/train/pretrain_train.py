"""Pretrain / few-shot / zero-shot drivers.

Pretrain loss (`pretrain/main_trans.py:113-137`): CE(event_scores pooled over
segments, clip label) + dynamically-weighted symmetric CE on the B x B
audio<->image contrastive logits against the identity.

Zero-shot (`zero-shot/zero_shot.py:151-177`): argmax of event_scores vs GT on
AVE / AVE-cls / LLP-cls. Few-shot (`few-shot/main_AVE.py`): the same model
fine-tuned on K examples per class with staged loss weights.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import PretrainModelConfig, TrainConfig
from ..models import pretrain
from . import losses
from .ave_train import make_optimizer  # shared Adam + StepLR


def soft_cross_entropy(logits, soft_targets):
    """torch CrossEntropyLoss with probability targets."""
    return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits, -1) * soft_targets, -1))


def pretrain_loss(out, labels, *, epoch, num_frames=10, weak=True):
    """labels: (B, n_cls) clip-level one-hot (weak) — main_trans.py:113-137."""
    ev = out["event_scores"]
    B = labels.shape[0]
    if weak:
        ev = jnp.mean(ev.reshape(B, num_frames, -1), axis=1)
    loss_event = losses.cross_entropy(ev, jnp.argmax(labels, -1))
    eye = jnp.eye(B)
    loss_ai = soft_cross_entropy(out["logits_audio_image"], eye)
    loss_ia = soft_cross_entropy(out["logits_image_audio"], eye)
    denom = epoch + loss_event + loss_ai + loss_ia
    w1 = loss_event / denom + 1.0 / epoch
    w2 = loss_ai / denom + 1.0 / epoch
    w3 = loss_ia / denom + 1.0 / epoch
    return w1 * loss_event + w2 * loss_ai + w3 * loss_ia


def partition_pretrain_params(params):
    """Freezing policy for the pretrain suite: CLIP towers + HTS-AT frozen;
    adapters, prompt ctx, clip adapters, audio projection trainable."""
    frozen_keys = {"visual", "text", "htsat", "clap_text_features"}
    trainable = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    return trainable, frozen


def make_pretrain_step(cfg: PretrainModelConfig, buffers, tx, *, donate=False):
    @functools.partial(jax.jit, donate_argnums=(0, 2, 3) if donate else (),
                       static_argnames=("epoch",))
    def step(trainable, frozen, state, opt_state, batch, rng, epoch=1):
        def loss_fn(tr, st):
            params = dict(frozen)
            params.update(tr)
            out, new_state = pretrain.forward(
                params, st, buffers, batch["wave"], batch["image"], cfg,
                train=True, rng=rng, mixup_lambda=batch.get("mixup_lambda"))
            return pretrain_loss(out, batch["label"], epoch=epoch,
                                 num_frames=cfg.num_frames), (out, new_state)

        (loss, (out, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, {"loss": loss}

    return step


def make_pretrain_eval_step(cfg: PretrainModelConfig, buffers):
    @jax.jit
    def eval_step(trainable, frozen, state, batch):
        params = dict(frozen)
        params.update(trainable)
        out, _ = pretrain.forward(params, state, buffers, batch["wave"],
                                  batch["image"], cfg, train=False)
        return out["event_scores"]

    return eval_step


def weak_accuracy(event_scores, weak_labels, *, num_frames):
    """Clip-level classification accuracy (main_trans.py:181-215 weak branch;
    zero_shot.py:160-177 cls modes): mean event scores over segments, argmax
    vs the weak label's argmax."""
    scores = np.asarray(event_scores)
    B = scores.shape[0] // num_frames
    clip = scores.reshape(B, num_frames, -1).mean(axis=1)
    return 100.0 * float(np.mean(clip.argmax(-1) == np.asarray(weak_labels).argmax(-1)))


def segment_accuracy(event_scores, gt):
    """Per-segment event accuracy (zero_shot.py:154-156 `is_event_score`):
    argmax of (B*T, n_cls) scores vs argmax of (B, T, n_cls_gt) GT. The GT may
    carry a trailing background class the prompt set lacks — mirrored as-is."""
    scores = np.asarray(event_scores)
    gt = np.asarray(gt)
    tgt = gt.reshape(-1, gt.shape[-1]).argmax(-1)
    return 100.0 * float(np.mean(scores.argmax(-1) == tgt))


def zero_shot_scores(params, state, buffers, wave, images, cfg, *, num_frames=10):
    """Event scores for zero-shot eval (zero_shot_model.py:24-109): the
    pretrain forward's modality-weighted logits, segment-level."""
    out, _ = pretrain.forward(params, state, buffers, wave, images, cfg, train=False)
    return out["event_scores"]


def zero_shot_accuracy(event_scores, gt):
    """Segment-level argmax accuracy vs (B, T, n_cls) one-hot GT
    (zero_shot.py:151-177)."""
    B, T, n = gt.shape
    pred = jnp.argmax(event_scores.reshape(B, T, -1), axis=-1)
    tgt = jnp.argmax(gt, axis=-1)
    return 100.0 * jnp.mean((pred == tgt).astype(jnp.float32))


def few_shot_subsample(labels, k_shot, *, seed=0):
    """Indices of a K-shot subset per class (few-shot/dataloader.py:97-170).
    labels: (N,) int class ids (host numpy)."""
    import numpy as np
    rs = np.random.RandomState(seed)
    by_class = {}
    for i, c in enumerate(np.asarray(labels)):
        by_class.setdefault(int(c), []).append(i)
    keep = []
    for c, idxs in sorted(by_class.items()):
        idxs = np.asarray(idxs)
        rs.shuffle(idxs)
        keep.extend(idxs[:k_shot].tolist())
    return sorted(keep)
