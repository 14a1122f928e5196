"""TPAVI temporal pixel-wise audio-visual non-local attention (AVS).

Rebuild of `DG-SCT/AVS/avs_scripts/avs_s4/model/TPAVI.py:6-180`, 'dot' mode,
dimension=3, bn_layer=True. All 1x1x1 convs are channel matmuls; layout is
channels-last (B, T, H, W, C) throughout (the reference shuttles NCTHW).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import (batch_norm, batch_norm_init, layer_norm,
                         layer_norm_init, linear, linear_init)


def init_tpavi(key, in_channels, dtype=jnp.float32):
    inter = in_channels // 2
    k = jax.random.split(key, 5)
    params = {
        "align_channel": linear_init(k[0], in_channels // 2, in_channels, dtype=dtype),
        "norm_layer": layer_norm_init(in_channels, dtype),
        "g": linear_init(k[1], in_channels, inter, dtype=dtype),
        "theta": linear_init(k[2], in_channels, inter, dtype=dtype),
        "phi": linear_init(k[3], in_channels, inter, dtype=dtype),
        "W_z": linear_init(k[4], inter, in_channels, dtype=dtype),
    }
    bn_p, bn_s = batch_norm_init(in_channels, dtype)
    # reference zero-inits the BN scale AND bias (TPAVI.py:62-63) so the
    # non-local branch starts as identity
    bn_p = {"scale": jnp.zeros_like(bn_p["scale"]), "bias": bn_p["bias"]}
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def tpavi(params, state, x, audio=None, *, train=False):
    """x: (B, T, H, W, C); audio: (B, T, C//2) or None (then video self-attn).

    Returns (z (B,T,H,W,C), audio_aligned (B,T,C) or None, new_state).
    'dot' mode: f = theta(x) @ phi(audio)^T / N, y = f @ g(x).
    """
    B, T, H, W, C = x.shape
    THW = T * H * W

    if audio is not None:
        audio_aligned = linear(params["align_channel"], audio)     # (B, T, C)
        kv = jnp.broadcast_to(audio_aligned[:, :, None, None, :], x.shape)
    else:
        audio_aligned = None
        kv = x

    g_x = linear(params["g"], x).reshape(B, THW, -1)               # (B, THW, C')
    theta_x = linear(params["theta"], x).reshape(B, THW, -1)
    phi_x = linear(params["phi"], kv).reshape(B, THW, -1)
    f = jnp.einsum("bnc,bmc->bnm", theta_x, phi_x,
                   preferred_element_type=jnp.float32) / THW
    y = jnp.einsum("bnm,bmc->bnc", f.astype(x.dtype), g_x)
    y = y.reshape(B, T, H, W, -1)

    w_y = linear(params["W_z"], y)
    w_y, bn_state = batch_norm(params["bn"], state["bn"], w_y, train=train, axis=-1)
    z = w_y + x
    z = layer_norm(params["norm_layer"], z)
    return z, audio_aligned, {"bn": bn_state}
