"""AVVP model — the `MGN_Net` equivalent (`DG-SCT/AVVP/nets/mgn.py:417-763`).

Shares the interleaved dual-tower encoder with AVE (the reference duplicates
it verbatim at mgn.py:670-708; here it is one function). On top: per-modality
projections to `dim`=128, a slim TemporalAttention gate (mgn.py:107-159),
r2plus1d ("video_st") fusion, GroupViT-style class-aware unimodal grouping
(audio CUG w/ HAN, visual CUG) and cross-modal AV grouping, then the
probability heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AVVPModelConfig
from . import grouping as G
from . import htsat as H
from . import interleave as I
from . import swinv2 as S
from .heads import ave as ave_heads
from ..ops.basic import linear, linear_init
from ..ops.rnn import bilstm, bilstm_init


# ---------------------------------------------------------------------------
# slim TemporalAttention (mgn.py:107-159): gates only, d_model 64, gamma 0.05
# ---------------------------------------------------------------------------

def init_slim_temporal_attention(key, dim=128, d_model=64, dtype=jnp.float32):
    k = jax.random.split(key, 6)
    return {
        "audio_rnn": bilstm_init(k[0], dim, d_model, dtype),
        "visual_rnn": bilstm_init(k[1], dim, d_model, dtype),
        "video_encoder": {"affine": linear_init(k[2], 2 * d_model, d_model, dtype=dtype),
                          "layers": [ave_heads.init_encoder_layer(kk, d_model, 1024, dtype)
                                     for kk in jax.random.split(k[3], 2)]},
        "audio_encoder": {"affine": linear_init(k[4], 2 * d_model, d_model, dtype=dtype),
                          "layers": [ave_heads.init_encoder_layer(kk, d_model, 1024, dtype)
                                     for kk in jax.random.split(k[5], 2)]},
        "audio_gated": linear_init(jax.random.fold_in(key, 7), d_model, 1, dtype=dtype),
        "video_gated": linear_init(jax.random.fold_in(key, 8), d_model, 1, dtype=dtype),
    }


def slim_temporal_attention(params, v_feat, a_feat, *, gamma=0.05, train=False, rng=None):
    """v_feat/a_feat: (B, 10, 128). Returns gated (v, a), same shapes.

    mgn.py:107-126: both RNNs are bidirectional LSTM(128, 64) -> 128-d, both
    InternalTemporalRelationModule affines map 128 -> d_model 64.
    """
    a_rnn = bilstm(params["audio_rnn"], a_feat)       # (B,10,128)
    v_rnn = bilstm(params["visual_rnn"], v_feat)      # (B,10,128)
    a_seq = a_rnn.transpose(1, 0, 2)
    v_seq = v_rnn.transpose(1, 0, 2)

    def run_encoder(p, x):
        x = linear(p["affine"], x)
        for lp in p["layers"]:
            x = ave_heads.encoder_layer(lp, x, nhead=4, train=train)
        return x

    video_kv = run_encoder(params["video_encoder"], v_seq)   # (10,B,64)
    audio_kv = run_encoder(params["audio_encoder"], a_seq)
    audio_gate = jax.nn.sigmoid(linear(params["audio_gated"], audio_kv)).transpose(1, 0, 2)
    video_gate = jax.nn.sigmoid(linear(params["video_gated"], video_kv)).transpose(1, 0, 2)
    v_out = v_feat + audio_gate * v_feat * gamma
    a_out = a_feat + video_gate * a_feat * gamma
    return v_out, a_out


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_avvp_model(key, cfg: AVVPModelConfig, dtype=jnp.float32):
    k = jax.random.split(key, 16)
    swin_params = S.init_swinv2(k[0], cfg.swin, dtype)
    htsat_params, htsat_state = H.init_htsat(k[1], cfg.htsat, dtype)
    adapter_params, adapter_state = I.init_adapters(k[2], cfg, dtype)
    d = cfg.dim
    params = {
        "swin": swin_params,
        "htsat": htsat_params,
        "adapters": adapter_params,
        "fc_a": linear_init(k[3], cfg.htsat.num_features, d, dtype=dtype),
        "fc_v": linear_init(k[4], cfg.swin.num_features, d, dtype=dtype),
        "fc_st": linear_init(k[5], 512, d, dtype=dtype),
        "fc_fusion": linear_init(k[6], 2 * d, d, dtype=dtype),
        "audio_token": jnp.zeros((cfg.num_classes, d), dtype),
        "visual_token": jnp.zeros((cfg.num_classes, d), dtype),
        "audio_cug": G.modality_trans_init(k[7], d, depth=cfg.depth_aud,
                                           num_group_tokens=cfg.num_classes,
                                           num_output_groups=cfg.num_classes,
                                           use_han=True, han_tokens=cfg.num_frames,
                                           dtype=dtype),
        "visual_cug": G.modality_trans_init(k[8], d, depth=cfg.depth_vis,
                                            num_group_tokens=cfg.num_classes,
                                            num_output_groups=cfg.num_classes,
                                            dtype=dtype),
        "av_mcg": G.modality_trans_init(k[9], d, depth=cfg.depth_av,
                                        num_group_tokens=cfg.num_classes,
                                        num_output_groups=cfg.num_classes,
                                        dtype=dtype),
        "fc_prob": linear_init(k[10], d, 1, dtype=dtype),
        "fc_prob_a": linear_init(k[11], d, 1, dtype=dtype),
        "fc_prob_v": linear_init(k[12], d, 1, dtype=dtype),
        "fc_cls": linear_init(k[13], d, cfg.num_classes, dtype=dtype),
        "temporal_attn": init_slim_temporal_attention(k[14], d, dtype=dtype),
    }
    state = {"htsat": htsat_state, "adapters": adapter_state}
    return params, state


def forward(params, state, wave, images, video_st, cfg: AVVPModelConfig, *,
            train=False, rng=None, mixup_lambda=None):
    """wave (B,10,L), images (B,10,H,W,3), video_st (B,10,512) r2plus1d feats.

    Returns dict matching mgn.py:745-763's tuple.
    """
    B, T = wave.shape[0], wave.shape[1]
    enc_rng = head_rng = None
    if rng is not None:
        enc_rng, head_rng = jax.random.split(rng)

    feats, new_state = I.forward(params, state, wave.reshape(B * T, -1),
                                 images.reshape((B * T,) + images.shape[2:]),
                                 cfg, train=train, rng=enc_rng,
                                 mixup_lambda=mixup_lambda)
    f_v = feats["f_v"].reshape(B, T, -1)
    f_a = feats["f_a"].reshape(B, T, -1)

    x1_0 = linear(params["fc_a"], f_a)                       # (B,10,128)
    vid_s = linear(params["fc_v"], f_v)
    vid_s, x1_0 = slim_temporal_attention(params["temporal_attn"], vid_s, x1_0,
                                          train=train, rng=head_rng)
    vid_st = linear(params["fc_st"], video_st)
    x2_0 = linear(params["fc_fusion"], jnp.concatenate([vid_s, vid_st], axis=-1))

    hard = cfg.unimodal_assign == "hard"
    xhard = cfg.crossmodal_assign == "hard"
    r = lambda i: jax.random.fold_in(head_rng, i) if head_rng is not None else None
    x2, attn_visual, _ = G.modality_trans(params["visual_cug"], x2_0,
                                          params["visual_token"], hard=hard,
                                          gumbel=hard, train=train, rng=r(0),
                                          return_attn=True)
    x1, attn_audio, _ = G.modality_trans(params["audio_cug"], x1_0,
                                         params["audio_token"], x_other=x2_0,
                                         hard=hard, gumbel=hard, train=train,
                                         rng=r(1), return_attn=True)
    x, _, _ = G.modality_trans(params["av_mcg"], x1, x2, hard=xhard,
                               gumbel=xhard, train=train, rng=r(2),
                               return_attn=True)

    av_prob = jax.nn.sigmoid(linear(params["fc_prob"], x))          # (B,25,1)
    global_prob = jnp.sum(av_prob, axis=-1)                          # (B,25)
    aud_cls_prob = linear(params["fc_cls"], params["audio_token"])   # (25,25)
    vis_cls_prob = linear(params["fc_cls"], params["visual_token"])

    key = cfg.unimodal_assign
    attn_a = attn_audio[key][:, :, :]                                # (B,25,10)
    attn_v = attn_visual[key][:, :, :]

    a_prob = jax.nn.sigmoid(linear(params["fc_prob_a"], x1))         # (B,25,1)
    a_frame_prob = (a_prob * attn_a).transpose(0, 2, 1)              # (B,10,25)
    a_prob = jnp.sum(a_prob, axis=-1)
    v_prob = jax.nn.sigmoid(linear(params["fc_prob_v"], x2))
    v_frame_prob = (v_prob * attn_v).transpose(0, 2, 1)
    v_prob = jnp.sum(v_prob, axis=-1)

    out = {"aud_cls_prob": aud_cls_prob, "vis_cls_prob": vis_cls_prob,
           "global_prob": global_prob, "a_prob": a_prob, "v_prob": v_prob,
           "a_frame_prob": a_frame_prob, "v_frame_prob": v_frame_prob}
    return out, new_state
