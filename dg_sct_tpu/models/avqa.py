"""AVQA model — the `AVQA_Fusion_Net` equivalent
(`DG-SCT/AVQA/net_grd_avst/net_avst.py:238-626`).

Positive visual path runs the interleaved dual-tower encoder; the negative
path runs the frozen Swin tower standalone (net_avst.py:502-505, no_grad).
Question encoding: Embedding(93, 1536) -> tanh -> LSTM(1536) -> cat(h, c) ->
fc. Audio-visual grounding (softmax over the 6x6 grid) feeds a pos/neg match
classifier; question-as-query MHA over visual/audio + FFN; fusion mul ->
42-way answer head.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AVQAModelConfig
from ..ops.basic import dropout, layer_norm, layer_norm_init, linear, linear_init
from ..ops.mha import mha, mha_init
from ..ops.rnn import lstm_cell_init, lstm_with_state
from . import htsat as H
from . import interleave as I
from . import swinv2 as S


def init_qst_encoder(key, vocab=93, word_embed=1536, embed=1536, hidden=1536,
                     dtype=jnp.float32):
    k = jax.random.split(key, 3)
    return {
        "word2vec": jax.random.normal(k[0], (vocab, word_embed), dtype),
        "lstm": lstm_cell_init(k[1], word_embed, hidden, dtype),
        "fc": linear_init(k[2], 2 * hidden, embed, dtype=dtype),
    }


def qst_encoder(params, question):
    """question: (B, L) int tokens -> (B, embed)."""
    vec = jnp.tanh(params["word2vec"][question])            # (B, L, E)
    _, (hT, cT) = lstm_with_state(params["lstm"], vec)
    feat = jnp.tanh(jnp.concatenate([hT, cT], axis=-1))     # (B, 2H)
    return linear(params["fc"], feat)


def init_avqa_model(key, cfg: AVQAModelConfig, dtype=jnp.float32):
    k = jax.random.split(key, 24)
    d = cfg.embed_dim  # 1536
    params = {
        "swin": S.init_swinv2(k[0], cfg.swin, dtype),
        "adapters": None,
        "fc_a1": linear_init(k[3], cfg.htsat.num_features, d, dtype=dtype),
        "fc_a2": linear_init(k[4], d, d, dtype=dtype),
        "fc_gl": linear_init(k[5], 2 * d, d, dtype=dtype),
        "fc_fusion": linear_init(k[6], 2 * d, d, dtype=dtype),
        "linear11": linear_init(k[7], d, d, dtype=dtype),
        "linear12": linear_init(k[8], d, d, dtype=dtype),
        "linear21": linear_init(k[9], d, d, dtype=dtype),
        "linear22": linear_init(k[10], d, d, dtype=dtype),
        "norm1": layer_norm_init(d, dtype),
        "norm2": layer_norm_init(d, dtype),
        "attn_a": mha_init(k[11], d, dtype),
        "attn_v": mha_init(k[12], d, dtype),
        "question_encoder": init_qst_encoder(k[13], cfg.qst_vocab_size, d, d, d, dtype),
        "fc_ans": linear_init(k[14], d, cfg.ans_vocab_size, dtype=dtype),
        "fc1": linear_init(k[15], 2 * d, 512, dtype=dtype),
        "fc2": linear_init(k[16], 512, 256, dtype=dtype),
        "fc3": linear_init(k[17], 256, 128, dtype=dtype),
        "fc4": linear_init(k[18], 128, 2, dtype=dtype),
    }
    htsat_params, htsat_state = H.init_htsat(k[1], cfg.htsat, dtype)
    adapter_params, adapter_state = I.init_adapters(k[2], cfg, dtype)
    params["htsat"] = htsat_params
    params["adapters"] = adapter_params
    state = {"htsat": htsat_state, "adapters": adapter_state}
    return params, state


def _grounding(params, audio_feat, visual_tokens):
    """AV grounding over the 6x6 grid + match features (net_avst.py:543-592).
    audio_feat: (B*T, C); visual_tokens: (B*T, HW, C). Returns (match_logits,
    visual_feat_grd (B*T, C))."""
    before = jnp.mean(visual_tokens, axis=1)                      # (B*T, C)
    vnorm = visual_tokens / (jnp.linalg.norm(visual_tokens, axis=2, keepdims=True) + 1e-12)
    anorm = audio_feat / (jnp.linalg.norm(audio_feat, axis=1, keepdims=True) + 1e-12)
    scores = jnp.einsum("bnc,bc->bn", vnorm, anorm)               # (B*T, HW)
    p = jax.nn.softmax(scores, axis=-1)
    after = jnp.einsum("bn,bnc->bc", p, vnorm)
    grd = jnp.tanh(jnp.concatenate([before, after], axis=-1))
    grd = linear(params["fc_gl"], grd)                            # (B*T, C)

    feat = jnp.concatenate([audio_feat, grd], axis=-1)
    feat = jax.nn.relu(linear(params["fc1"], feat))
    feat = jax.nn.relu(linear(params["fc2"], feat))
    feat = jax.nn.relu(linear(params["fc3"], feat))
    return linear(params["fc4"], feat), grd


def forward(params, state, wave, visual_posi, visual_nega, question,
            cfg: AVQAModelConfig, *, train=False, rng=None, mixup_lambda=None):
    """wave (B,T,L), visual_posi/nega (B,T,H,W,3), question (B,L) ints.

    Returns ({out_qa (B,42), out_match_posi, out_match_nega}, new_state)."""
    B, T = wave.shape[0], wave.shape[1]
    d = cfg.embed_dim
    rngs = jax.random.split(rng, 8) if rng is not None else [None] * 8

    feats, new_state = I.forward(
        params, state, wave.reshape(B * T, -1),
        visual_posi.reshape((B * T,) + visual_posi.shape[2:]), cfg,
        train=train, rng=rngs[0], mixup_lambda=mixup_lambda)

    # full visual token grid from the adapted tower; the pooled f_v is unused
    # here — AVQA grounds over all 36 tokens (net_avst.py:512-515)
    posi_tokens = feats["vis_tokens"]                             # (B*T, 36, 1536)
    f_a = feats["f_a"][:, 0, :]                                   # (B*T, 768)

    # negative branch: frozen swin only, stop-gradient (torch.no_grad)
    nega = visual_nega.reshape((B * T,) + visual_nega.shape[2:])
    nega_tokens = jax.lax.stop_gradient(
        S.forward_features(params["swin"], nega, cfg.swin, train=False))

    audio = f_a.reshape(B, T, -1)
    audio_feat = jax.nn.relu(linear(params["fc_a1"], audio))
    audio_feat = linear(params["fc_a2"], audio_feat)              # (B, T, 1536)
    audio_feat_pure = audio_feat
    audio_flat = audio_feat.reshape(B * T, d)

    qst = qst_encoder(params["question_encoder"], question)       # (B, 1536)

    out_match_posi, grd_posi = _grounding(params, audio_flat, posi_tokens)
    out_match_nega, _ = _grounding(params, audio_flat, nega_tokens)

    # question-as-query attention (net_avst.py:604-615); time-major MHA
    xq = qst[None]                                                # (1, B, C)
    v_seq = grd_posi.reshape(B, T, d).transpose(1, 0, 2)          # (T, B, C)
    a_seq = audio_feat_pure.transpose(1, 0, 2)

    def ffn(x, l1, l2, r1, r2):
        h = jax.nn.relu(linear(params[l1], x))
        if train and r1 is not None:
            h = dropout(r1, h, 0.1, train)
        src = linear(params[l2], h)
        if train and r2 is not None:
            src = dropout(r2, src, 0.1, train)
        return x + src

    v_att = mha(params["attn_v"], xq, v_seq, v_seq, num_heads=4,
                rng=rngs[1], dropout_rate=0.1, train=train)[0]    # (B, C)
    v_att = layer_norm(params["norm1"], ffn(v_att, "linear11", "linear12",
                                            rngs[2], rngs[4]))

    a_att = mha(params["attn_a"], xq, a_seq, a_seq, num_heads=4,
                rng=rngs[3], dropout_rate=0.1, train=train)[0]
    a_att = layer_norm(params["norm2"], ffn(a_att, "linear21", "linear22",
                                            rngs[5], rngs[6]))

    feat = jnp.concatenate([
        a_att + jnp.mean(audio_feat_pure, axis=1),
        v_att + jnp.mean(grd_posi.reshape(B, T, d), axis=1)], axis=-1)
    feat = jnp.tanh(feat)
    feat = linear(params["fc_fusion"], feat)

    combined = jnp.tanh(feat * qst)
    out_qa = linear(params["fc_ans"], combined)                   # (B, 42)

    out = {"out_qa": out_qa, "out_match_posi": out_match_posi,
           "out_match_nega": out_match_nega}
    return out, new_state
