"""Loss library.

Active AVE loss (`DG-SCT/AVE/main_trans.py:119-130`):
  BCE(is_event, fg) + BCE(gate, fg) + CE(event_scores, cls) + CE(av_score, cls)

Plus the criterion library surface (`DG-SCT/AVE/criterion.py:7-576`) — most of
it dormant in the reference but part of the API.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, weight=None):
    """Mean BCE-with-logits (torch nn.BCEWithLogitsLoss semantics)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)


def cross_entropy(logits, labels):
    """Mean CE over integer labels (torch nn.CrossEntropyLoss semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def info_nce(features_a, features_b, temperature=0.07):
    """Symmetric InfoNCE over paired embeddings (criterion.py InfoNCELoss)."""
    a = features_a / (jnp.linalg.norm(features_a, axis=-1, keepdims=True) + 1e-8)
    b = features_b / (jnp.linalg.norm(features_b, axis=-1, keepdims=True) + 1e-8)
    logits = a @ b.T / temperature
    labels = jnp.arange(a.shape[0])
    return 0.5 * (cross_entropy(logits, labels) + cross_entropy(logits.T, labels))


def contrastive_loss(x0, x1, y, margin=1.0):
    """Euclidean contrastive loss (criterion.py ContrastiveLoss, dormant in
    the reference but part of the criterion-library surface). y: 1=similar."""
    dist_sq = jnp.sum(jnp.square(x0 - x1), axis=1)
    dist = jnp.sqrt(dist_sq + 1e-12)
    mdist = jnp.maximum(margin - dist, 0.0)
    loss = y * dist_sq + (1.0 - y) * jnp.square(mdist)
    return jnp.mean(loss) / 2.0


def mask_info_nce(q, k, mask, temperature=0.05):
    """Masked InfoNCE (criterion.py MaskInfoNCELoss, dormant): standard NCE
    over normalized q/k with positives selected by a boolean mask row."""
    qn = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-8)
    kn = k / (jnp.linalg.norm(k, axis=1, keepdims=True) + 1e-8)
    sim = qn @ kn.T / temperature
    logp = jax.nn.log_softmax(sim, axis=-1)
    pos = jnp.sum(logp * mask, axis=-1) / jnp.maximum(jnp.sum(mask, -1), 1.0)
    return -jnp.mean(pos)


def ave_labels(gt):
    """gt: (B, T, 29) one-hot with bg=28 (main_trans.py:118-123).

    Returns (fg_binary (B,T), clip_class (B,)): per-segment foreground flag and
    the clip-level event class (max of per-segment argmax over foreground dims).
    """
    fg = gt[:, :, :-1]
    labels_bce = jnp.max(fg, axis=-1)            # (B, T) 1 if event
    labels_evn = jnp.argmax(fg, axis=-1)         # (B, T) class idx
    labels_event = jnp.max(labels_evn, axis=-1)  # (B,)
    return labels_bce, labels_event


def ave_loss(outputs, gt):
    """The reference's composite AVE loss (main_trans.py:124-130).

    Logits are reduced in f32: under bf16 mixed-precision compute the
    log-softmax/BCE reductions stay full-precision."""
    outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
    labels_bce, labels_event = ave_labels(gt)
    loss = (bce_with_logits(outputs["is_event_scores"], labels_bce)
            + bce_with_logits(outputs["av_gate"], labels_bce)
            + cross_entropy(outputs["event_scores"], labels_event)
            + cross_entropy(outputs["av_score"], labels_event))
    return loss
