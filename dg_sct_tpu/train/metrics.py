"""Evaluation metrics.

AVE accuracy mirrors `compute_accuracy_supervised` (`DG-SCT/AVE/main_trans.py:309-325`);
segment/event-level F1 (AVVP) mirrors `utils/eval_metrics.py:3-295`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ave_accuracy(is_event_scores, event_scores, gt):
    """is_event_scores (B,T) logits, event_scores (B,28), gt (B,T,29) one-hot.

    Per-segment prediction: background (28) unless sigmoid(is_event) > 0.5, in
    which case the clip-level argmax class. Returns % accuracy (scalar).
    """
    targets = jnp.argmax(gt, axis=-1)                     # (B, T)
    pos = jax.nn.sigmoid(is_event_scores) > 0.5
    cls = jnp.argmax(event_scores, axis=-1)[:, None]      # (B, 1)
    pred = jnp.where(pos, cls, 28)
    return 100.0 * jnp.mean((pred == targets).astype(jnp.float32))


# ---------------------------------------------------------------------------
# AVVP segment/event-level F1 (numpy host metrics, mirrors eval_metrics.py)
# ---------------------------------------------------------------------------

# NOTE: the faithful AVVP segment/event-level F1 implementations (matching
# eval_metrics.py per-class aggregation conventions) live in
# `dg_sct_tpu.train.avvp_eval`.


def mask_iou(pred_probs, gt, eps=1e-7):
    """Binary mask IoU averaged over the batch, with the reference's
    no-object special case (AVS `utility.py:45-70`): for all-background GTs,
    IoU is measured on background agreement. pred_probs: sigmoided (N, H, W)."""
    pred = (np.asarray(pred_probs) > 0.5).astype(np.float32).reshape(len(pred_probs), -1)
    gt = (np.asarray(gt) > 0.5).astype(np.float32).reshape(len(gt), -1)
    inter = (pred * gt).sum(-1)
    union = np.maximum(pred, gt).sum(-1)
    no_obj = gt.sum(-1) == 0
    inter[no_obj] = ((1 - gt) * (1 - pred)).sum(-1)[no_obj]
    union[no_obj] = gt.shape[-1]
    return float(np.mean(inter / (union + eps)))


def f_measure(pred_probs, gt, beta2=0.3, pr_num=255):
    """AVS `Eval_Fmeasure` (utility.py:88-120): per-image P/R over 255
    thresholds, F-curves averaged over non-empty-GT images, max of the
    averaged curve. pred_probs: sigmoided (N, H, W)."""
    pred = np.asarray(pred_probs).reshape(len(pred_probs), -1)
    gt = (np.asarray(gt).reshape(len(gt), -1) > 0.5).astype(np.float32)
    ths = np.linspace(0.0, 1.0 - 1e-10, pr_num)
    avg_f = np.zeros(pr_num)
    img_num = 0
    for i in range(len(pred)):
        if gt[i].mean() == 0.0:
            continue
        binary = pred[i][None, :] >= ths[:, None]          # (pr_num, P)
        tp = (binary * gt[i][None, :]).sum(-1)
        prec = tp / (binary.sum(-1) + 1e-20)
        rec = tp / (gt[i].sum() + 1e-20)
        with np.errstate(invalid="ignore"):  # 0/0 at empty thresholds -> nan
            f = (1 + beta2) * prec * rec / (beta2 * prec + rec)
        avg_f += np.nan_to_num(f)
        img_num += 1
    if img_num == 0:
        return 0.0
    return float((avg_f / img_num).max())


def save_masks(pred_probs, save_base_path, categories, video_names,
               num_frames=5):
    """Write thresholded prediction masks as P-mode pngs under
    `<base>/<category>/<video>/<video>_<t>.png` — `save_mask`
    (avs_s4/utils/utility.py:122-147), driven by `--save-pred-mask`.
    pred_probs: sigmoided (B*T, H, W)."""
    import os

    from PIL import Image

    masks = (np.asarray(pred_probs) > 0.5).astype(np.uint8) * 255
    masks = masks.reshape(-1, num_frames, *masks.shape[-2:])
    for idx, (cat, vid) in enumerate(zip(categories, video_names)):
        d = os.path.join(save_base_path, cat, vid)
        os.makedirs(d, exist_ok=True)
        for t in range(num_frames):
            Image.fromarray(masks[idx, t]).convert("P").save(
                os.path.join(d, f"{vid}_{t}.png"), format="PNG")
