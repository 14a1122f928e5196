"""Dormant/legacy AVE modules — interface-parity rebuilds of dead code kept in
the reference tree (zero live call sites; SURVEY.md §2.7).

  * CAS_Module                — DG-SCT/AVE/nets/net_trans.py:96-113
  * WeaklyLocalizationModule  — net_trans.py:141-165
  * AudioVisualContrastive    — net_trans.py:296-375
  * AudioVisualAdapter        — net_trans.py:378-431
  * New_Audio_Guided_Attention — DG-SCT/AVE/nets/models.py:174-275

Everything is a pure `init_* / apply` pair over explicit pytrees; the batched
per-sample python loops of the originals become einsums (MXU-friendly, static
shapes). Where the dead torch code would crash if executed (see the
AudioVisualAdapter note), the evident intent is implemented and the defect is
documented.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import (dropout, layer_norm, layer_norm_init, linear,
                         linear_init)
from ..ops.rnn import bilstm, bilstm_init
from .heads.ave import init_encoder_layer, encoder_layer


# ---------------------------------------------------------------------------
# CAS_Module (net_trans.py:96-113): 1x1 conv classifier over time
# ---------------------------------------------------------------------------

def init_cas_module(key, d_model, num_class=28, dtype=jnp.float32):
    # Conv1d(d_model -> num_class+1, k=1, bias=False) == a pointwise linear
    return {"classifier": linear_init(key, d_model, num_class + 1, bias=False,
                                      dtype=dtype)}


def cas_module(params, content):
    """content: (B, T, d_model) -> (B, T, num_class+1)."""
    return linear(params["classifier"], content)


# ---------------------------------------------------------------------------
# WeaklyLocalizationModule (net_trans.py:141-165)
# ---------------------------------------------------------------------------

def init_weakly_localization(key, input_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"classifier": linear_init(k1, input_dim, 1, dtype=dtype),
            "event_classifier": linear_init(k2, input_dim, 29, dtype=dtype)}


def weakly_localization(params, fused_content):
    """fused_content: time-major (T, B, D) as the reference feeds it.

    Returns (is_event_scores (B, T), raw_logits (B, 29), event_scores (B, 29)).
    """
    x = jnp.swapaxes(fused_content, 0, 1)              # (B, T, D)
    max_pooled = jnp.max(x, axis=1)                    # (B, D)
    is_event_scores = linear(params["classifier"], x)[..., 0]       # (B, T)
    raw_logits = linear(params["event_classifier"], max_pooled)     # (B, 29)
    fused_logits = jax.nn.sigmoid(is_event_scores)[..., None] * raw_logits[:, None, :]
    logits = jnp.max(fused_logits, axis=1)             # (B, 29)
    return is_event_scores, raw_logits, jax.nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# AudioVisualContrastive (net_trans.py:296-375): cross-batch AV match scorer
# ---------------------------------------------------------------------------

def init_audio_visual_contrastive(key, dtype=jnp.float32):
    k = jax.random.split(key, 7)
    return {"fc_v1": linear_init(k[0], 1536, 512, dtype=dtype),
            "fc_a1": linear_init(k[1], 768, 512, dtype=dtype),
            "fc_gl": linear_init(k[2], 1024, 512, dtype=dtype),
            "fc1": linear_init(k[3], 1024, 512, dtype=dtype),
            "fc2": linear_init(k[4], 512, 256, dtype=dtype),
            "fc3": linear_init(k[5], 256, 128, dtype=dtype),
            "fc4": linear_init(k[6], 128, 1, dtype=dtype)}


def audio_visual_contrastive(params, video, audio, f_v_spatial_att_maps, T=10):
    """video: (B*T, 36, 1536); audio: (B*T, 1, 768) or (B*T, 768);
    f_v_spatial_att_maps: (B*T, 1, 36). Returns (B*B, T, 1) match scores for
    every (audio_i, video_j) pairing — the reference's nested loop
    (net_trans.py:341-353) flattened to one einsum pass."""
    if audio.ndim == 3:
        audio = audio[:, 0]
    bs = video.shape[0] // T
    v = linear(params["fc_v1"], video)                   # (B*T, 36, 512)
    a = linear(params["fc_a1"], audio)                   # (B*T, 512)

    v_before = jnp.einsum("bon,bnc->boc", f_v_spatial_att_maps, v)[:, 0]
    v_norm = v / jnp.clip(jnp.linalg.norm(v, axis=2, keepdims=True), 1e-12)
    a_norm = a / jnp.clip(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)

    v_before = v_before.reshape(bs, T, 512)
    v_norm = v_norm.reshape(bs, T, -1, 512)              # (B, T, 36, 512)
    a_norm = a_norm.reshape(bs, T, 512)

    # grounding for every (audio batch i, video batch j) pair
    x2 = jnp.einsum("jtnc,itc->ijtn", v_norm, a_norm)    # (Bv=j, Ba=i)->scores
    p = jax.nn.softmax(x2, axis=-1)
    grounded = jnp.einsum("ijtn,jtnc->ijtc", p, v_norm)  # (i, j, T, 512)
    before = jnp.broadcast_to(v_before[None], grounded.shape)
    gl = jnp.tanh(jnp.concatenate([before, grounded], axis=-1))
    v_grd = linear(params["fc_gl"], gl)                  # (i, j, T, 512)

    a_rep = jnp.broadcast_to(a.reshape(bs, T, 512)[:, None], v_grd.shape)
    feat = jnp.concatenate([a_rep, v_grd], axis=-1)      # (i, j, T, 1024)
    feat = jax.nn.relu(linear(params["fc1"], feat))
    feat = jax.nn.relu(linear(params["fc2"], feat))
    feat = jax.nn.relu(linear(params["fc3"], feat))
    out = linear(params["fc4"], feat)                    # (i, j, T, 1)
    return out.reshape(bs * bs, T, 1)


# ---------------------------------------------------------------------------
# AudioVisualAdapter (net_trans.py:378-431)
# ---------------------------------------------------------------------------

def init_audio_visual_adapter(key, dtype=jnp.float32):
    k = jax.random.split(key, 7)
    d = 256
    return {"fc_v": linear_init(k[0], 1536, 512, dtype=dtype),
            "fc_a": linear_init(k[1], 768, 128, dtype=dtype),
            "rnn_audio": bilstm_init(k[2], 128, d // 2, dtype),
            "rnn_video": bilstm_init(k[3], 512, d, dtype),
            "audio_encoder": {"affine": linear_init(k[4], d, d, dtype=dtype),
                              "layers": [init_encoder_layer(kk, d, 1024, dtype)
                                         for kk in jax.random.split(k[4], 2)]},
            "video_encoder": {"affine": linear_init(k[5], 512, d, dtype=dtype),
                              "layers": [init_encoder_layer(kk, d, 1024, dtype)
                                         for kk in jax.random.split(k[5], 2)]},
            "audio_gated": linear_init(k[6], d, 1, dtype=dtype),
            "video_gated": linear_init(jax.random.split(k[6])[1], d, 1, dtype=dtype)}


def _itr_encoder(params, x, *, train=False, rng=None):
    """InternalTemporalRelationModule (net_trans.py:62-76): affine + relu then
    2 post-norm encoder layers; input/output time-major."""
    h = jax.nn.relu(linear(params["affine"], x))
    for i, lp in enumerate(params["layers"]):
        r = jax.random.fold_in(rng, i) if rng is not None else None
        h = encoder_layer(lp, h, nhead=4, train=train, rng=r)
    return h


def audio_visual_adapter(params, x, audio, *, alpha=0.6, train=False, rng=None):
    """x: (B*10, 1536) pooled visual; audio: (B*10, 768).

    NOTE (reference defect, net_trans.py:394-431): the torch original (a)
    assigns `self.fc_a` twice so the 768->128 projection is lost, (b) calls
    `self.fc_v` which was never defined, and (c) feeds the RAW 1536/768
    features to an RNN built for 512/128 — it would crash if executed. This
    rebuild implements the evident intent: project, BiLSTM, encode, gate each
    modality by the other.

    Returns (x_gated (B*10, 1536), audio_gated (B*10, 768)).
    """
    bs = x.shape[0] // 10
    xv = x.reshape(bs, 10, -1)
    au = audio.reshape(bs, 10, -1)
    f_v = linear(params["fc_v"], xv)                     # (B, 10, 512)
    f_a = linear(params["fc_a"], au)                     # (B, 10, 128)
    a_rnn = bilstm(params["rnn_audio"], f_a)             # (B, 10, 256)
    v_rnn = bilstm(params["rnn_video"], f_v)             # (B, 10, 512)
    a_kv = _itr_encoder(params["audio_encoder"], jnp.swapaxes(a_rnn, 0, 1),
                        train=train, rng=rng)
    v_kv = _itr_encoder(params["video_encoder"], jnp.swapaxes(v_rnn, 0, 1),
                        train=train,
                        rng=None if rng is None else jax.random.fold_in(rng, 7))
    audio_gate = jax.nn.sigmoid(linear(params["audio_gated"], a_kv))  # (10,B,1)
    video_gate = jax.nn.sigmoid(linear(params["video_gated"], v_kv))
    xv = xv + jnp.swapaxes(audio_gate, 0, 1) * xv * alpha
    au = au + jnp.swapaxes(video_gate, 0, 1) * au * alpha
    return xv.reshape(bs * 10, -1), au.reshape(bs * 10, -1)


# ---------------------------------------------------------------------------
# New_Audio_Guided_Attention (models.py:174-275)
# ---------------------------------------------------------------------------

def init_new_audio_guided_attention(key, dtype=jnp.float32):
    k = jax.random.split(key, 13)
    vd, ad, hd = 512, 128, 256
    return {"affine_video_1": linear_init(k[0], vd, vd, dtype=dtype),
            "affine_audio_1": linear_init(k[1], ad, vd, dtype=dtype),
            "affine_bottleneck": linear_init(k[2], vd, hd, dtype=dtype),
            "affine_v_c_att": linear_init(k[3], hd, vd, dtype=dtype),
            "affine_video_2": linear_init(k[4], vd, hd, dtype=dtype),
            "affine_audio_2": linear_init(k[5], ad, hd, dtype=dtype),
            "affine_v_s_att": linear_init(k[6], hd, 1, dtype=dtype),
            "video_query": linear_init(k[7], vd, vd // 4, dtype=dtype),
            "video_key": linear_init(k[8], vd, vd // 4, dtype=dtype),
            "video_value": linear_init(k[9], vd, vd, dtype=dtype),
            "affine_video_ave": linear_init(k[10], vd, hd, dtype=dtype),
            "affine_video_3": linear_init(k[11], vd, hd, dtype=dtype),
            "ave_v_att": linear_init(k[12], hd, 1, dtype=dtype),
            "norm": layer_norm_init(vd, dtype)}


def new_audio_guided_attention(params, video, audio, *, beta=0.4,
                               train=False, rng=None):
    """video: (B, T, H, W, 512); audio: (T, B, 128) time-major as the
    reference receives it (models.py:222). Returns (B, T, 512)."""
    audio = jnp.swapaxes(audio, 0, 1)                    # (B, T, 128)
    B, T, H, W, vd = video.shape
    a = audio.reshape(B * T, -1)
    v = video.reshape(B * T, H * W, vd)
    raw_v = v

    # self attention over spatial positions (models.py:229-239)
    q = linear(params["video_query"], v)
    kk = linear(params["video_key"], v)
    energy = jnp.einsum("bnc,bmc->bnm", q, kk)
    attn = jax.nn.softmax(energy, axis=-1)
    val = linear(params["video_value"], v)
    out = jnp.einsum("bnm,bmc->bnc", attn, val)
    if train and rng is not None:
        out = dropout(jax.random.fold_in(rng, 0), out, 0.2, train)
    v = layer_norm(params["norm"], v + out)

    # video self spatial attention (models.py:241-248)
    v_avg = jax.nn.relu(linear(params["affine_video_ave"], jnp.mean(v, axis=1)))
    self_q = jax.nn.relu(linear(params["affine_video_3"], v)) * v_avg[:, None]
    self_maps = jax.nn.softmax(
        jnp.tanh(linear(params["ave_v_att"], self_q))[..., 0], axis=-1)
    self_att = jnp.einsum("bn,bnc->bc", self_maps, v).reshape(B, T, vd)

    # audio-guided channel attention (models.py:251-257)
    aq1 = jax.nn.relu(linear(params["affine_audio_1"], a))[:, None]
    vq1 = jax.nn.relu(linear(params["affine_video_1"], v))
    avq = jnp.mean(aq1 * vq1, axis=1)
    avq = jax.nn.relu(linear(params["affine_bottleneck"], avq))
    c_maps = jax.nn.sigmoid(linear(params["affine_v_c_att"], avq))   # (B*T, vd)
    c_att = raw_v * (c_maps[:, None] + 1.0)

    # audio-guided spatial attention (models.py:260-268)
    cq = jax.nn.relu(linear(params["affine_video_2"], c_att))
    aq2 = jax.nn.relu(linear(params["affine_audio_2"], a))[:, None]
    s_maps = jax.nn.softmax(
        jnp.tanh(linear(params["affine_v_s_att"], cq * aq2))[..., 0], axis=-1)
    cs = jnp.einsum("bn,bnc->bc", s_maps, c_att).reshape(B, T, vd)

    return cs + beta * jax.nn.sigmoid(self_att) * cs
