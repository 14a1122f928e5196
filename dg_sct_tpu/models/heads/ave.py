"""AVE task head: TemporalAttention (bi-LSTM + cross-modal transformer
enc/dec + sigmoid gates) and CMBS (CAS top-k + localize module).

Rebuild of `DG-SCT/AVE/nets/net_trans.py:44-292` and the small transformer
library `nets/models.py:14-171`. All sequence tensors are time-major (T, B, E)
to match the reference's call convention; T=10 segments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.basic import dropout, layer_norm, layer_norm_init, linear, linear_init
from ...ops.mha import mha, mha_init
from ...ops.rnn import bilstm, bilstm_init


# ---------------------------------------------------------------------------
# transformer enc/dec layers (models.py:74-157): post-norm, relu FFN
# ---------------------------------------------------------------------------

def init_encoder_layer(key, d_model, ffn, dtype=jnp.float32):
    k = jax.random.split(key, 3)
    return {"self_attn": mha_init(k[0], d_model, dtype),
            "linear1": linear_init(k[1], d_model, ffn, dtype=dtype),
            "linear2": linear_init(k[2], ffn, d_model, dtype=dtype),
            "norm1": layer_norm_init(d_model, dtype),
            "norm2": layer_norm_init(d_model, dtype)}


def encoder_layer(params, src, *, nhead, train=False, rng=None, p_drop=0.1):
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    s2 = mha(params["self_attn"], src, src, src, num_heads=nhead,
             rng=rngs[0], dropout_rate=p_drop, train=train)
    if train and rngs[1] is not None:
        s2 = dropout(rngs[1], s2, p_drop, train)
    src = layer_norm(params["norm1"], src + s2)
    h = jax.nn.relu(linear(params["linear1"], src))
    if train and rngs[2] is not None:
        h = dropout(rngs[2], h, p_drop, train)
    s2 = linear(params["linear2"], h)
    if train and rngs[3] is not None:
        s2 = dropout(rngs[3], s2, p_drop, train)
    return layer_norm(params["norm2"], src + s2)


def init_decoder_layer(key, d_model, ffn, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    return {"self_attn": mha_init(k[0], d_model, dtype),   # present but unused
            "multihead_attn": mha_init(k[1], d_model, dtype),
            "linear1": linear_init(k[2], d_model, ffn, dtype=dtype),
            "linear2": linear_init(k[3], ffn, d_model, dtype=dtype),
            "norm1": layer_norm_init(d_model, dtype),
            "norm2": layer_norm_init(d_model, dtype)}


def decoder_layer(params, tgt, memory, *, nhead, train=False, rng=None, p_drop=0.1):
    """models.py:144-157: memory = cat([memory, tgt]); cross-attn only
    (the self_attn weights exist but are never used in forward)."""
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    mem = jnp.concatenate([memory, tgt], axis=0)
    t2 = mha(params["multihead_attn"], tgt, mem, mem, num_heads=nhead,
             rng=rngs[0], dropout_rate=p_drop, train=train)
    if train and rngs[1] is not None:
        t2 = dropout(rngs[1], t2, p_drop, train)
    tgt = layer_norm(params["norm1"], tgt + t2)
    h = jax.nn.relu(linear(params["linear1"], tgt))
    if train and rngs[2] is not None:
        h = dropout(rngs[2], h, p_drop, train)
    t2 = linear(params["linear2"], h)
    if train and rngs[3] is not None:
        t2 = dropout(rngs[3], t2, p_drop, train)
    return layer_norm(params["norm2"], tgt + t2)


# ---------------------------------------------------------------------------
# TemporalAttention (net_trans.py:182-251)
# ---------------------------------------------------------------------------

D_MODEL = 256
V_FC_DIM = 512
A_FC_DIM = 128


def init_temporal_attention(key, v_dim=1536, a_dim=768, dtype=jnp.float32):
    k = jax.random.split(key, 12)
    return {
        "v_fc": linear_init(k[0], v_dim, V_FC_DIM, dtype=dtype),
        "a_fc": linear_init(k[1], a_dim, A_FC_DIM, dtype=dtype),
        "audio_rnn": bilstm_init(k[2], A_FC_DIM, D_MODEL // 2, dtype),
        "visual_rnn": bilstm_init(k[3], V_FC_DIM, D_MODEL, dtype),
        "video_encoder": {"affine": linear_init(k[4], V_FC_DIM, D_MODEL, dtype=dtype),
                          "layers": [init_encoder_layer(kk, D_MODEL, 1024, dtype)
                                     for kk in jax.random.split(k[5], 2)]},
        "audio_encoder": {"affine": linear_init(k[6], D_MODEL, D_MODEL, dtype=dtype),
                          "layers": [init_encoder_layer(kk, D_MODEL, 1024, dtype)
                                     for kk in jax.random.split(k[7], 2)]},
        "video_decoder": {"affine": linear_init(k[8], V_FC_DIM, D_MODEL, dtype=dtype),
                          "layers": [init_decoder_layer(jax.random.split(k[8])[1], D_MODEL, 1024, dtype)]},
        "audio_decoder": {"affine": linear_init(k[9], D_MODEL, D_MODEL, dtype=dtype),
                          "layers": [init_decoder_layer(jax.random.split(k[9])[1], D_MODEL, 1024, dtype)]},
        "audio_gated": linear_init(k[10], D_MODEL, 1, dtype=dtype),
        "video_gated": linear_init(k[11], D_MODEL, 1, dtype=dtype),
    }


def temporal_attention(params, f_v, f_a, *, train=False, rng=None, gamma=0.1):
    """f_v: (B, 10, 1536), f_a: (B, 10, 768).

    Returns time-major (video_out, audio_out, av_gate): (10, B, 256) x2, (10, B, 1).
    """
    rngs = jax.random.split(rng, 8) if rng is not None else [None] * 8
    a = linear(params["a_fc"], f_a)                              # (B,10,128)
    v = linear(params["v_fc"], f_v)
    v = jax.nn.relu(v)
    if train and rngs[0] is not None:
        v = dropout(rngs[0], v, 0.2, train)

    a_rnn = bilstm(params["audio_rnn"], a)                       # (B,10,256)
    v_rnn = bilstm(params["visual_rnn"], v)                      # (B,10,512)
    a_seq = a_rnn.transpose(1, 0, 2)                             # (10,B,256)
    v_seq = v_rnn.transpose(1, 0, 2)                             # (10,B,512)

    def run_encoder(p, x, rng):
        x = linear(p["affine"], x)
        for i, lp in enumerate(p["layers"]):
            r = jax.random.fold_in(rng, i) if rng is not None else None
            x = encoder_layer(lp, x, nhead=4, train=train, rng=r)
        return x

    def run_decoder(p, tgt, memory, rng):
        tgt = linear(p["affine"], tgt)
        for i, lp in enumerate(p["layers"]):
            r = jax.random.fold_in(rng, i) if rng is not None else None
            tgt = decoder_layer(lp, tgt, memory, nhead=4, train=train, rng=r)
        return tgt

    video_kv = run_encoder(params["video_encoder"], v_seq, rngs[1])
    audio_query_out = run_decoder(params["audio_decoder"], a_seq, video_kv, rngs[2])
    audio_kv = run_encoder(params["audio_encoder"], a_seq, rngs[3])
    video_query_out = run_decoder(params["video_decoder"], v_seq, audio_kv, rngs[4])

    audio_gate = jax.nn.sigmoid(linear(params["audio_gated"], audio_kv))
    video_gate = jax.nn.sigmoid(linear(params["video_gated"], video_kv))
    av_gate = audio_gate * video_gate

    video_query_out = video_query_out + audio_gate * video_query_out * gamma
    audio_query_out = audio_query_out + video_gate * audio_query_out * gamma
    return video_query_out, audio_query_out, av_gate


# ---------------------------------------------------------------------------
# CMBS (net_trans.py:254-292)
# ---------------------------------------------------------------------------

def init_cmbs(key, num_classes=28, dtype=jnp.float32):
    k = jax.random.split(key, 6)
    return {
        "AVInter": init_av_inter(k[0], D_MODEL, dtype),   # params kept for ckpt
        "VAInter": init_av_inter(k[1], D_MODEL, dtype),   # parity; outputs unused
        "video_cas": linear_init(k[2], D_MODEL, num_classes, dtype=dtype),
        "audio_cas": linear_init(k[3], D_MODEL, num_classes, dtype=dtype),
        "localize_classifier": linear_init(k[4], D_MODEL, 1, dtype=dtype),
        "localize_event": linear_init(k[5], D_MODEL, num_classes, dtype=dtype),
    }


def init_av_inter(key, d_model, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    return {"mha": mha_init(k1, d_model, dtype), "norm1": layer_norm_init(d_model, dtype)}


def cmbs(params, video_feat, audio_feat, *, gamma=0.3, topk=4):
    """video/audio_feat: (10, B, 256) time-major.

    Returns (is_event_scores (10,B,1), event_scores (B,28), av_score (B,28)).
    Note: the AVInter/VAInter outputs are computed-but-unused in the reference
    (net_trans.py:286-289); we keep the weights but skip the dead compute.
    """
    topk = min(topk, video_feat.shape[0])
    video_cas = linear(params["video_cas"], video_feat).transpose(1, 0, 2)  # (B,10,28)
    audio_cas = linear(params["audio_cas"], audio_feat).transpose(1, 0, 2)
    score_v = jnp.mean(jax.lax.top_k(video_cas.transpose(0, 2, 1), topk)[0], axis=-1)
    score_a = jnp.mean(jax.lax.top_k(audio_cas.transpose(0, 2, 1), topk)[0], axis=-1)
    av_score = 0.5 * (score_v + score_a)                                    # (B,28)

    fused = 0.5 * (video_feat + audio_feat)                                 # (10,B,256)
    is_event_scores = linear(params["localize_classifier"], fused)          # (10,B,1)
    max_fused = jnp.max(fused.transpose(1, 0, 2), axis=1)                   # (B,256)
    event_scores = linear(params["localize_event"], max_fused) + gamma * av_score
    return is_event_scores, event_scores, av_score
