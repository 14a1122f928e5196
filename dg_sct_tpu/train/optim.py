"""Optimizer with the reference's freezing policy as optax masks.

The reference walks `named_parameters` (`DG-SCT/AVE/main_trans.py:211-270`):
swin/htsat frozen; `adapter_blocks`, `CMBS`, `temporal_attn`, `mlp_class`
trainable; `mlp_class` gets `lr_mlp`, the rest `lr`; Adam + StepLR. Here the
same policy is an `optax.multi_transform` over path masks — frozen params get
`set_to_zero`, so the whole tree jits as one update.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

FROZEN_ROOTS = ("swin", "htsat")
MLP_LR_ROOTS = ("mlp_class",)


def param_group(path) -> str:
    """Map a param path to its group: 'frozen' | 'mlp' | 'train'."""
    root = path[0].key if hasattr(path[0], "key") else str(path[0])
    if root in FROZEN_ROOTS:
        return "frozen"
    if root in MLP_LR_ROOTS:
        return "mlp"
    return "train"


def group_labels(params):
    return jax.tree_util.tree_map_with_path(lambda p, _: param_group(p), params)


def step_lr(base_lr: float, decay_epoch: int, decay: float, steps_per_epoch: int):
    """StepLR(step_size=decay_epoch, gamma=decay) as an optax schedule
    (main_trans.py:279)."""
    def sched(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * (decay ** (epoch // decay_epoch))
    return sched


def count_params(params):
    """(total, trainable, frozen) parameter counts — reproduces the
    parameter-efficiency accounting printed at main_trans.py:271-273."""
    labels = group_labels(params)
    total = trainable = 0
    for p, l in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(labels)):
        n = p.size
        total += n
        if l != "frozen":
            trainable += n
    return total, trainable, total - trainable
