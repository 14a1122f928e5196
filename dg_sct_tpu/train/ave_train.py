"""AVE training/eval steps: jit-compiled, mesh-sharded, frozen-backbone-aware.

Replaces the reference driver loop (`DG-SCT/AVE/main_trans.py:83-143`). Key
deviation from the reference (deliberate, TPU-first): frozen params are
*partitioned out* of the differentiated tree, so the backward pass never
materializes backbone weight gradients (the reference computes-then-discards
them via `requires_grad=False` at the autograd level).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..configs import AVEModelConfig, TrainConfig
from ..models import ave
from . import losses
from .metrics import ave_accuracy
from .optim import param_group, step_lr


def partition_params(params):
    """Split the param tree into (trainable, frozen) by the reference's
    freezing policy (main_trans.py:211-270)."""
    trainable = {k: v for k, v in params.items() if param_group((jax.tree_util.DictKey(k),)) != "frozen"}
    frozen = {k: v for k, v in params.items() if k not in trainable}
    return trainable, frozen


def merge_params(trainable, frozen):
    out = dict(frozen)
    out.update(trainable)
    return out


def cast_for_compute(tree, dtype):
    """Mixed-precision view of the trainable tree: f32 Adam masters stay the
    optimizer's state, but the fwd/bwd COMPUTE uses `dtype` copies.  Without
    this, bf16 activations x f32 trainable kernels promote every adapter/
    head GEMM (forward AND transposed backward) to f32 — far off the v5e
    MXU rate.  Gradients flow through the cast (convert_element_type has a
    convert transpose), so the optimizer still receives f32 grads; the loss
    reductions are f32 regardless (losses.ave_loss upcasts at entry)."""
    if dtype in (None, jnp.float32):
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree)


def canonicalize(tree):
    """Strip weak types / host scalars so repeated step calls hit the same
    compiled executable (a weak-typed leaf in the first opt_state caused a
    full recompile on the second training step)."""
    def fix(x):
        if hasattr(x, "astype") and hasattr(x, "dtype"):
            return jnp.asarray(x).astype(x.dtype)
        return jnp.asarray(x)
    return jax.tree_util.tree_map(fix, tree)


def make_optimizer(trainable, train_cfg: TrainConfig, steps_per_epoch: int):
    """Adam + StepLR over the trainable tree, with the reference's per-group
    lr split: `mlp_class` trains at `lr_mlp`, everything else at `lr`
    (main_trans.py:211-270 name walk; both default 5e-4)."""
    from .optim import group_labels

    def adam_at(lr):
        return optax.adam(step_lr(lr, train_cfg.decay_epoch, train_cfg.decay,
                                  steps_per_epoch))

    if train_cfg.lr_mlp != train_cfg.lr:
        tx = optax.multi_transform(
            {"train": adam_at(train_cfg.lr), "mlp": adam_at(train_cfg.lr_mlp)},
            group_labels(trainable))
    else:
        tx = adam_at(train_cfg.lr)
    if train_cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, train_cfg.accum_steps)
    return tx


def make_train_step(cfg: AVEModelConfig, tx, *, donate=True):
    @functools.partial(jax.jit, donate_argnums=(0, 2, 3) if donate else ())
    def _step(trainable, frozen, state, opt_state, batch, rng):
        def loss_fn(tr, st):
            params = merge_params(cast_for_compute(tr, cfg.compute_dtype),
                                  frozen)
            out, new_state = ave.forward(
                params, st, batch["wave"], batch["image"], cfg, train=True,
                rng=rng, mixup_lambda=batch.get("mixup_lambda"))
            return losses.ave_loss(out, batch["gt"]), (out, new_state)

        (loss, (out, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        acc = ave_accuracy(out["is_event_scores"], out["event_scores"], batch["gt"])
        return trainable, new_state, opt_state, {"loss": loss, "acc": acc}

    def train_step(trainable, frozen, state, opt_state, batch, rng):
        return _step(canonicalize(trainable), frozen, canonicalize(state),
                     canonicalize(opt_state), canonicalize(batch), rng)

    return train_step


def make_eval_step(cfg: AVEModelConfig):
    @jax.jit
    def eval_step(trainable, frozen, state, batch):
        params = merge_params(trainable, frozen)
        out, _ = ave.forward(params, state, batch["wave"], batch["image"], cfg,
                             train=False)
        correct_frac = ave_accuracy(out["is_event_scores"], out["event_scores"],
                                    batch["gt"]) / 100.0
        return {"correct_frac": correct_frac, "outputs": out}

    return eval_step
