"""AVS 4-scale TemporalAttention head.

Rebuild of the AVS variant at `PVT_AVSModel.py:447-582`: per-scale
(56/28/14/7) avg-pooled 256-d features go through per-scale bi-LSTMs +
temporal relation enc/dec; sigmoid audio gates modulate each scale's feature
map, and the mean video gate modulates the audio feature.

Reference dims (channel=256, audio 128, d_model 256) generalize as
channel / channel//2 / channel so tiny configs shrink coherently.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.basic import dropout, linear, linear_init
from ...ops.rnn import bilstm, bilstm_init
from . import ave as ave_heads


def init_avs_temporal_attention(key, channel=256, dtype=jnp.float32):
    d_model = channel
    audio_dim = channel // 2

    def scale_params(k):
        kk = jax.random.split(k, 7)
        return {
            "v_fc": linear_init(kk[0], channel, channel, dtype=dtype),
            "audio_rnn": bilstm_init(kk[1], audio_dim, audio_dim, dtype),
            "visual_rnn": bilstm_init(kk[2], channel, channel, dtype),
            "video_encoder": {"affine": linear_init(kk[3], 2 * channel, d_model, dtype=dtype),
                              "layers": [ave_heads.init_encoder_layer(k2, d_model, 1024, dtype)
                                         for k2 in jax.random.split(kk[3], 2)]},
            "audio_encoder": {"affine": linear_init(kk[4], 2 * audio_dim, d_model, dtype=dtype),
                              "layers": [ave_heads.init_encoder_layer(k2, d_model, 1024, dtype)
                                         for k2 in jax.random.split(kk[4], 2)]},
            "video_decoder": {"affine": linear_init(kk[5], 2 * channel, d_model, dtype=dtype),
                              "layers": [ave_heads.init_decoder_layer(jax.random.split(kk[5])[1], d_model, 1024, dtype)]},
            "audio_decoder": {"affine": linear_init(kk[6], 2 * audio_dim, d_model, dtype=dtype),
                              "layers": [ave_heads.init_decoder_layer(jax.random.split(kk[6])[1], d_model, 1024, dtype)]},
            "audio_gated": linear_init(jax.random.fold_in(k, 101), d_model, 1, dtype=dtype),
            "video_gated": linear_init(jax.random.fold_in(k, 102), d_model, 1, dtype=dtype),
        }

    return {"scales": [scale_params(k) for k in jax.random.split(key, 4)]}


def avs_temporal_attention(params, feature_maps, audio_feature, *, num_frames=5,
                           gamma=0.05, train=False, rng=None):
    """feature_maps: list of 4 (B*T, H_i, W_i, C); audio_feature (B, T, C//2).

    Returns (gated feature maps, gated audio (B*T, C//2)).
    """
    B = audio_feature.shape[0]
    T = num_frames
    new_maps = []
    video_gates = []
    for i, (p, fm) in enumerate(zip(params["scales"], feature_maps)):
        pooled = jnp.mean(fm, axis=(1, 2)).reshape(B, T, -1)      # (B,T,C)
        v = linear(p["v_fc"], pooled)
        v = jax.nn.relu(v)
        if train and rng is not None:
            v = dropout(jax.random.fold_in(rng, i), v, 0.2, train)

        a_rnn = bilstm(p["audio_rnn"], audio_feature)             # (B,T,C)
        v_rnn = bilstm(p["visual_rnn"], v)                        # (B,T,2C)
        a_seq = a_rnn.transpose(1, 0, 2)
        v_seq = v_rnn.transpose(1, 0, 2)

        def run_enc(pp, x):
            x = linear(pp["affine"], x)
            for lp in pp["layers"]:
                x = ave_heads.encoder_layer(lp, x, nhead=4, train=train)
            return x

        video_kv = run_enc(p["video_encoder"], v_seq)
        audio_kv = run_enc(p["audio_encoder"], a_seq)
        audio_gate = jax.nn.sigmoid(linear(p["audio_gated"], audio_kv))  # (T,B,1)
        video_gate = jax.nn.sigmoid(linear(p["video_gated"], video_kv))
        ag = audio_gate.transpose(1, 0, 2).reshape(B * T, 1, 1, 1)
        new_maps.append(fm + ag * fm * gamma)
        video_gates.append(video_gate.transpose(1, 0, 2).reshape(B * T, 1))

    vg = sum(video_gates) / 4.0
    audio_flat = audio_feature.reshape(B * T, -1)
    audio_out = audio_flat + vg * audio_flat * gamma
    return new_maps, audio_out
