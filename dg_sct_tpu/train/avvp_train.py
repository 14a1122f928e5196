"""AVVP training/eval steps — the `DG-SCT/AVVP/main.py` driver equivalent.

Loss (main.py:46-69): BCE on clamped probabilities for the global AV, audio
(label-smoothed Pa, a=1.0) and visual (Pv, v=0.9) heads, plus CE pushing each
class token to classify as its own class.

Freezing policy difference vs AVE (main.py:318-356): only swin/htsat frozen;
everything else (incl. grouping, tokens, heads) trains — which our standard
partition already implements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..configs import AVVPModelConfig, TrainConfig
from ..models import avvp
from . import losses
from .ave_train import make_optimizer, merge_params, partition_params  # shared policy


def bce_probs(probs, targets):
    """torch nn.BCELoss on (clamped) probabilities."""
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def avvp_loss(out, target):
    """target: (B, 25) weak multi-label. Mirrors main.py:52-69."""
    Pa = target                      # a = 1.0
    Pv = 0.9 * target + 0.05         # v = 0.9 -> v*t + (1-v)*0.5
    cls_target = jnp.arange(out["aud_cls_prob"].shape[0])
    return (bce_probs(out["global_prob"], target)
            + bce_probs(out["a_prob"], Pa)
            + bce_probs(out["v_prob"], Pv)
            + losses.cross_entropy(out["aud_cls_prob"], cls_target)
            + losses.cross_entropy(out["vis_cls_prob"], cls_target))


def make_train_step(cfg: AVVPModelConfig, tx, *, donate=True):
    @functools.partial(jax.jit, donate_argnums=(0, 2, 3) if donate else ())
    def train_step(trainable, frozen, state, opt_state, batch, rng):
        def loss_fn(tr, st):
            params = merge_params(tr, frozen)
            out, new_state = avvp.forward(
                params, st, batch["wave"], batch["image"], batch["video_st"],
                cfg, train=True, rng=rng,
                mixup_lambda=batch.get("mixup_lambda"))
            return avvp_loss(out, batch["target"]), (out, new_state)

        (loss, (out, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, {"loss": loss}

    return train_step


def make_eval_step(cfg: AVVPModelConfig):
    @jax.jit
    def eval_step(trainable, frozen, state, batch):
        params = merge_params(trainable, frozen)
        out, _ = avvp.forward(params, state, batch["wave"], batch["image"],
                              batch["video_st"], cfg, train=False)
        return out

    return eval_step
