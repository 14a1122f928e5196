"""AVS training: losses + train/eval steps.

Losses rebuild `avs_scripts/avs_s4/loss.py` (S4: first-frame BCE + optional
masked audio-visual similarity) and `avs_ms3/loss.py` (MS3: all-frame BCE).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..configs import AVSModelConfig, TrainConfig
from ..models import avs
from .ave_train import make_optimizer, merge_params, partition_params  # shared policy


def f1_iou_bce_loss(pred_logits, first_gt_mask, num_frames=5):
    """BCE of the FIRST frame only (S4; loss.py:7-31). pred (B*T, H, W, 1),
    first_gt_mask (B, H, W, 1)."""
    first_pred = pred_logits[::num_frames]
    p = jax.nn.sigmoid(first_pred)
    p = jnp.clip(p, 1e-7, 1 - 1e-7)
    g = first_gt_mask
    return -jnp.mean(g * jnp.log(p) + (1 - g) * jnp.log1p(-p))


def f5_iou_bce_loss(pred_logits, gt_masks):
    """BCE over ALL frames (MS3; avs_ms3/loss.py:7-26). pred (B*T, H, W, 1),
    gt (B*T, H, W, 1)."""
    p = jnp.clip(jax.nn.sigmoid(pred_logits), 1e-7, 1 - 1e-7)
    return -jnp.mean(gt_masks * jnp.log(p) + (1 - gt_masks) * jnp.log1p(-p))


def adaptive_avg_pool(x, H, W):
    """Exact `nn.AdaptiveAvgPool2d((H, W))` for evenly-divisible inputs
    (224 -> 56/28/14/7): window-mean via reshape. x: (N, H_in, W_in, C)."""
    N, H_in, W_in, C = x.shape
    assert H_in % H == 0 and W_in % W == 0, (H_in, W_in, H, W)
    return x.reshape(N, H, H_in // H, W, W_in // W, C).mean(axis=(2, 4))


def masked_av_simm_loss(pred_logits, a_fea_list, v_map_list, count_stages):
    """Loss_AVM_AV, S4 variant (avs_s4/loss.py:31-79): sigmoid -> adaptive
    avg-pool -> threshold mask, object-mean pooled visual map vs audio feature,
    -log(relu(cos)+eps)."""
    pred = jax.nn.sigmoid(pred_logits)          # (B*T, H, W, 1)
    total = 0.0
    for stage in count_stages:
        a_fea, v_map = a_fea_list[stage], v_map_list[stage]
        BT, H, W, C = v_map.shape
        a = a_fea.reshape(-1, a_fea.shape[-1])
        m = (adaptive_avg_pool(pred, H, W) > 0.5).astype(v_map.dtype)
        obj = jnp.sum(m, axis=(1, 2))
        pooled = jnp.sum(v_map * m, axis=(1, 2)) / (obj + 1e-6)
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        pooled = pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)
        cos = jax.nn.relu(jnp.sum(a * pooled, axis=-1)) + 1e-6
        total = total + jnp.mean(-jnp.log(cos))
    return total / max(len(count_stages), 1)


def masked_av_kl_loss(pred_logits, a_fea_list, v_map_list, count_stages,
                      *, norm_fea=True):
    """Loss_AVM_AV, MS3 `--kl_flag` variant (avs_ms3/loss.py:24-79): adaptive
    avg-pool the RAW logits then sigmoid (note the reversed order vs S4),
    soft-mask-mean the visual map (threshold=False), L2-normalize both, then
    `F.kl_div(log_softmax(masked_v), softmax(a), reduction='sum')`."""
    total = 0.0
    for stage in count_stages:
        a_fea, v_map = a_fea_list[stage], v_map_list[stage]
        BT, H, W, C = v_map.shape
        a = a_fea.reshape(-1, a_fea.shape[-1])
        m = jax.nn.sigmoid(adaptive_avg_pool(pred_logits, H, W))
        masked_v = jnp.mean(v_map * m, axis=(1, 2))           # (BT, C)
        if norm_fea:
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
            masked_v = masked_v / (jnp.linalg.norm(masked_v, axis=-1,
                                                   keepdims=True) + 1e-12)
        p = jax.nn.softmax(a, axis=-1)                        # target
        log_q = jax.nn.log_softmax(masked_v, axis=-1)         # input
        total = total + jnp.sum(p * (jnp.log(p + 1e-20) - log_q))
    return total / max(len(count_stages), 1)


def iou_semantic_aware_loss(out, first_gt_mask, *, lambda_1=0.0,
                            count_stages=(), sa_loss_flag=False, num_frames=5):
    """S4 composition (avs_s4/loss.py:82-118). Default flags (avs_s4/train.sh):
    sa_loss OFF — plain first-frame BCE."""
    loss = f1_iou_bce_loss(out["pred"], first_gt_mask, num_frames)
    if sa_loss_flag and count_stages:
        loss = loss + lambda_1 * masked_av_simm_loss(
            out["pred"], out["a_fea_list"], out["feature_map_list"], count_stages)
    return loss


def ms3_loss(out, gt_masks, *, lambda_1=0.5, count_stages=(0, 1, 2, 3),
             sa_loss_flag=True):
    """MS3 composition per `avs_ms3/train.sh`: all-frame BCE + 0.5 x KL
    masked-AV loss over stages 0-3 (`--masked_av_flag --masked_av_stages
    0 1 2 3 --lambda_1 0.5 --kl_flag`)."""
    loss = f5_iou_bce_loss(out["pred"], gt_masks)
    # only stages with a TPAVI audio feature participate (the reference also
    # fills a_fea_list per --tpavi_stages; MS3 train.sh enables all four)
    count_stages = tuple(s for s in count_stages
                         if out["a_fea_list"][s] is not None)
    if sa_loss_flag and count_stages:
        loss = loss + lambda_1 * masked_av_kl_loss(
            out["pred"], out["a_fea_list"], out["feature_map_list"], count_stages)
    return loss


def make_train_step(cfg: AVSModelConfig, tx, *, task="s4", donate=True):
    @functools.partial(jax.jit, donate_argnums=(0, 2, 3) if donate else ())
    def train_step(trainable, frozen, state, opt_state, batch, rng):
        def loss_fn(tr, st):
            params = merge_params(tr, frozen)
            out, new_state = avs.forward(params, st, batch["image"],
                                         batch["wave"], cfg, train=True, rng=rng,
                                         mixup_lambda=batch.get("mixup_lambda"))
            if task == "s4":
                loss = f1_iou_bce_loss(out["pred"], batch["mask"], cfg.num_frames)
            else:
                loss = ms3_loss(out, batch["mask"])
            return loss, (out, new_state)

        (loss, (out, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, new_state, opt_state, {"loss": loss}

    return train_step


def make_eval_step(cfg: AVSModelConfig):
    @jax.jit
    def eval_step(trainable, frozen, state, batch):
        params = merge_params(trainable, frozen)
        out, _ = avs.forward(params, state, batch["image"], batch["wave"], cfg,
                             train=False)
        return jax.nn.sigmoid(out["pred"])

    return eval_step
