"""AVQA stage-1 grounding generator — `AVQA_AVatt_Grounding` equivalent
(`DG-SCT/AVQA/grounding_gen/nets_grd_gen.py:39-210`).

Trains a pos/neg audio-visual match classifier over (frame-0 audio, frame-0
positive frame, frame-1 negative frame) pairs; its weights seed stage-2 via
key-matching transfer (main_avst.py:252-263 — our converter's
`restore_structure` + name overlap handles this since the heads share names).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AVQAModelConfig
from ..ops.basic import linear, linear_init
from . import htsat as H
from . import swinv2 as S


def init_grounding_model(key, cfg: AVQAModelConfig, dtype=jnp.float32):
    k = jax.random.split(key, 10)
    d = cfg.embed_dim
    params = {
        "swin": S.init_swinv2(k[0], cfg.swin, dtype),
        "fc_a1": linear_init(k[2], cfg.htsat.num_features, d, dtype=dtype),
        "fc_a2": linear_init(k[3], d, d, dtype=dtype),
        "fc_gl": linear_init(k[4], 2 * d, d, dtype=dtype),
        "fc1": linear_init(k[5], 2 * d, 512, dtype=dtype),
        "fc2": linear_init(k[6], 512, 256, dtype=dtype),
        "fc3": linear_init(k[7], 256, 128, dtype=dtype),
        "fc4": linear_init(k[8], 128, 2, dtype=dtype),
    }
    htsat_params, htsat_state = H.init_htsat(k[1], cfg.htsat, dtype)
    params["htsat"] = htsat_params
    return params, {"htsat": htsat_state}


def forward(params, state, wave, visual, cfg: AVQAModelConfig, *, train=False,
            rng=None, mixup_lambda=None):
    """wave: (B, T, L) — only segment 0 used; visual: (B, 2, H, W, 3) with
    frame 0 = positive, frame 1 = negative. Returns ((2B, 2) match logits,
    new_state)."""
    B = wave.shape[0]
    d = cfg.embed_dim

    # full HTS-AT tower on segment 0 (no adapters; nets_grd_gen.py:141-145)
    f_a, new_htsat_state = H.forward_features(
        params["htsat"], state["htsat"], wave[:, 0], cfg.htsat, train=train,
        rng=rng, mixup_lambda=mixup_lambda)
    f_a = jnp.mean(f_a, axis=1)                                 # (B, 768)

    # frozen swin on both frames
    frames = visual.reshape((B * 2,) + visual.shape[2:])
    vis_tokens = jax.lax.stop_gradient(
        S.forward_features(params["swin"], frames, cfg.swin, train=False))

    audio = jnp.repeat(f_a[:, None], 2, axis=1).reshape(B * 2, -1)
    audio_feat = jax.nn.relu(linear(params["fc_a1"], audio))
    audio_feat = linear(params["fc_a2"], audio_feat)            # (2B, 1536)

    before = jnp.mean(vis_tokens, axis=1)
    vnorm = vis_tokens / (jnp.linalg.norm(vis_tokens, axis=2, keepdims=True) + 1e-12)
    anorm = audio_feat / (jnp.linalg.norm(audio_feat, axis=1, keepdims=True) + 1e-12)
    p = jax.nn.softmax(jnp.einsum("bnc,bc->bn", vnorm, anorm), axis=-1)
    after = jnp.einsum("bn,bnc->bc", p, vnorm)
    grd = linear(params["fc_gl"], jnp.tanh(jnp.concatenate([before, after], -1)))

    feat = jnp.concatenate([audio_feat, grd], axis=-1)
    feat = jax.nn.relu(linear(params["fc1"], feat))
    feat = jax.nn.relu(linear(params["fc2"], feat))
    feat = jax.nn.relu(linear(params["fc3"], feat))
    logits = linear(params["fc4"], feat)                        # (2B, 2)
    return logits, {"htsat": new_htsat_state}
