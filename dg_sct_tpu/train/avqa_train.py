"""AVQA training/eval steps — `net_grd_avst/main_avst.py` driver equivalent.

Loss (main_avst.py:101-103): CE(out_qa, answer) + 0.5 * CE(match, match_label)
where the match batch interleaves positive (label 1) and negative (label 0)
pairs (`batch_organize`, main_avst.py:64-73).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..configs import AVQAModelConfig, TrainConfig
from ..models import avqa
from . import losses
from .ave_train import make_optimizer, merge_params, partition_params  # shared policy


def avqa_loss(out, answer):
    """answer: (B,) int labels."""
    match_logits = jnp.concatenate([out["out_match_posi"], out["out_match_nega"]], axis=0)
    n_pos = out["out_match_posi"].shape[0]
    match_label = jnp.concatenate([
        jnp.ones((n_pos,), jnp.int32), jnp.zeros((n_pos,), jnp.int32)])
    return (losses.cross_entropy(out["out_qa"], answer)
            + 0.5 * losses.cross_entropy(match_logits, match_label))


def make_train_step(cfg: AVQAModelConfig, tx, *, donate=True):
    @functools.partial(jax.jit, donate_argnums=(0, 2, 3) if donate else ())
    def train_step(trainable, frozen, state, opt_state, batch, rng):
        def loss_fn(tr, st):
            params = merge_params(tr, frozen)
            out, new_state = avqa.forward(
                params, st, batch["wave"], batch["visual_posi"],
                batch["visual_nega"], batch["question"], cfg, train=True,
                rng=rng, mixup_lambda=batch.get("mixup_lambda"))
            return avqa_loss(out, batch["answer"]), (out, new_state)

        (loss, (out, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        acc = jnp.mean((jnp.argmax(out["out_qa"], -1) == batch["answer"]).astype(jnp.float32))
        return trainable, new_state, opt_state, {"loss": loss, "qa_acc": acc}

    return train_step


def make_eval_step(cfg: AVQAModelConfig):
    @jax.jit
    def eval_step(trainable, frozen, state, batch):
        params = merge_params(trainable, frozen)
        out, _ = avqa.forward(params, state, batch["wave"], batch["visual_posi"],
                              batch["visual_nega"], batch["question"], cfg,
                              train=False)
        return out["out_qa"]

    return eval_step
