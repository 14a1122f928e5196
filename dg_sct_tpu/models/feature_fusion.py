"""CLAP `feature_fusion` — DAF / AFF / iAFF attentional feature fusion.

Rebuild of `pretrain/nets/feature_fusion.py:11-179` (itself from Dai et al.,
"Attentional Feature Fusion", WACV 2021). In the reference these fuse the
variable-length `mel_conv2d` features inside the CLAP `enable_fusion`
patch-embed; the released 630k checkpoint's fusion keys are skipped by the
loader (`pretrain/nets/net_trans.py:654-692`), so this is a dormant-but-
present component — implemented for interface completeness.

Layout is channel-last: (N, L, C) for '1D', (N, H, W, C) for '2D'. Every
reference Conv1d/Conv2d is kernel-size-1, i.e. a per-position linear over the
channel axis. Faithful quirks preserved:
  * iAFF's second round reuses `global_att` (NOT the separately-parameterized
    `global_att2`) — feature_fusion.py:127; `global_att2`'s params still
    exist for checkpoint-shape parity;
  * the batch-size-1 duplication guard around BatchNorm
    (feature_fusion.py:115-118,134-135).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import batch_norm, batch_norm_init, linear, linear_init


def _init_att_block(key, channels, inter, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p1, s1 = batch_norm_init(inter, dtype)
    p2, s2 = batch_norm_init(channels, dtype)
    params = {"fc1": linear_init(k1, channels, inter, dtype=dtype), "bn1": p1,
              "fc2": linear_init(k2, inter, channels, dtype=dtype), "bn2": p2}
    return params, {"bn1": s1, "bn2": s2}


def _att_block(params, state, x, *, train, global_pool=False):
    """conv1x1 -> BN -> ReLU -> conv1x1 -> BN (optionally after global
    average pooling over the spatial axes)."""
    if global_pool:
        x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)), keepdims=True)
    h = linear(params["fc1"], x)
    h, bn1 = batch_norm(params["bn1"], state["bn1"], h, train=train, axis=-1)
    h = jax.nn.relu(h)
    h = linear(params["fc2"], h)
    h, bn2 = batch_norm(params["bn2"], state["bn2"], h, train=train, axis=-1)
    return h, {"bn1": bn1, "bn2": bn2}


def daf(x, residual):
    """DirectAddFuse (feature_fusion.py:11-19)."""
    return x + residual


def init_aff(key, channels=64, r=4, dtype=jnp.float32):
    inter = channels // r
    k1, k2 = jax.random.split(key)
    pl, sl = _init_att_block(k1, channels, inter, dtype)
    pg, sg = _init_att_block(k2, channels, inter, dtype)
    return ({"local_att": pl, "global_att": pg},
            {"local_att": sl, "global_att": sg})


def _dup_guard(xa):
    """BatchNorm batch-of-1 guard (feature_fusion.py:115-118): duplicate the
    single example, fuse, then take the first half back."""
    if xa.shape[0] == 1:
        return jnp.concatenate([xa, xa], axis=0), True
    return xa, False


def aff(params, state, x, residual, *, train=False):
    """AFF (feature_fusion.py:138-190): wei = sigmoid(local(xa)+global(xa)),
    out = 2*x*wei + 2*residual*(1-wei) — the reference's forward scales both
    branches by 2 (feature_fusion.py:185-189)."""
    xa = x + residual
    xa2, dup = _dup_guard(xa)
    xl, sl = _att_block(params["local_att"], state["local_att"], xa2, train=train)
    xg, sg = _att_block(params["global_att"], state["global_att"], xa2,
                        train=train, global_pool=True)
    wei = jax.nn.sigmoid(xl + xg)
    if dup:
        wei = wei[:1]
    out = 2.0 * x * wei + 2.0 * residual * (1.0 - wei)
    return out, {"local_att": sl, "global_att": sg}


def init_iaff(key, channels=64, r=4, dtype=jnp.float32):
    inter = channels // r
    keys = jax.random.split(key, 4)
    params, state = {}, {}
    for name, k in zip(("local_att", "global_att", "local_att2", "global_att2"),
                       keys):
        params[name], state[name] = _init_att_block(k, channels, inter, dtype)
    return params, state


def iaff(params, state, x, residual, *, train=False):
    """iAFF (feature_fusion.py:22-135): two attention rounds; round 2 reuses
    `global_att` exactly as the reference forward does (its `global_att2`
    parameters are never applied)."""
    xa = x + residual
    xa2, dup = _dup_guard(xa)
    xl, sl = _att_block(params["local_att"], state["local_att"], xa2, train=train)
    xg, sg = _att_block(params["global_att"], state["global_att"], xa2,
                        train=train, global_pool=True)
    wei = jax.nn.sigmoid(xl + xg)
    if dup:
        wei = wei[:1]
    xi = x * wei + residual * (1.0 - wei)

    xi2, dup2 = _dup_guard(xi)
    xl2, sl2 = _att_block(params["local_att2"], state["local_att2"], xi2,
                          train=train)
    xg2, sg2 = _att_block(params["global_att"], sg, xi2, train=train,
                          global_pool=True)
    wei2 = jax.nn.sigmoid(xl2 + xg2)
    if dup2:
        wei2 = wei2[:1]
    out = x * wei2 + residual * (1.0 - wei2)
    new_state = {"local_att": sl, "global_att": sg2, "local_att2": sl2,
                 "global_att2": state["global_att2"]}
    return out, new_state
