"""PVT-v2 (Pyramid Vision Transformer v2) backbone.

Rebuild of `avs_scripts/avs_s4/model/pvt.py:15-422` (pvt_v2_b5). NOTE: the
reference instantiates PVT-v2-b5 and loads its ImageNet weights for AVS
(PVT_AVSModel.py:628, 968-977) but its forward is bypassed — the live
multi-scale features come from Swin (PVT_AVSModel.py:892-916). Implemented for
interface completeness.

Architecture: overlapping patch embeds (7x7/s4 then 3x3/s2), pre-norm blocks
with spatial-reduction attention (sr_ratio 8/4/2/1) and DWConv MLPs.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.basic import (conv2d, conv2d_init, layer_norm, layer_norm_init,
                         linear, linear_init)


@dataclasses.dataclass(frozen=True)
class PVTv2Config:
    img_size: int = 224
    embed_dims: tuple = (64, 128, 320, 512)
    depths: tuple = (3, 6, 40, 3)       # b5
    num_heads: tuple = (1, 2, 5, 8)
    mlp_ratios: tuple = (4, 4, 4, 4)
    sr_ratios: tuple = (8, 4, 2, 1)


def _dwconv_init(key, dim, dtype=jnp.float32):
    # depthwise 3x3: kernel (3, 3, 1, dim) with feature_group_count=dim
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.normal(k1, (3, 3, 1, dim), dtype) * 0.02,
            "bias": jnp.zeros((dim,), dtype)}


def _dwconv(params, x, H, W):
    B, L, C = x.shape
    img = x.reshape(B, H, W, C)
    y = jax.lax.conv_general_dilated(
        img, params["kernel"], (1, 1), "SAME", feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["bias"]
    return y.reshape(B, L, C)


def init_block(key, dim, heads, mlp_ratio, sr_ratio, dtype=jnp.float32):
    k = jax.random.split(key, 7)
    p = {
        "norm1": layer_norm_init(dim, dtype),
        "q": linear_init(k[0], dim, dim, dtype=dtype),
        "kv": linear_init(k[1], dim, 2 * dim, dtype=dtype),
        "proj": linear_init(k[2], dim, dim, dtype=dtype),
        "norm2": layer_norm_init(dim, dtype),
        "fc1": linear_init(k[3], dim, dim * mlp_ratio, dtype=dtype),
        "dwconv": _dwconv_init(k[4], dim * mlp_ratio, dtype),
        "fc2": linear_init(k[5], dim * mlp_ratio, dim, dtype=dtype),
    }
    if sr_ratio > 1:
        p["sr"] = conv2d_init(k[6], sr_ratio, sr_ratio, dim, dim, dtype=dtype)
        p["sr_norm"] = layer_norm_init(dim, dtype)
    return p


def block(params, x, H, W, *, heads, sr_ratio):
    B, L, C = x.shape
    hd = C // heads
    xn = layer_norm(params["norm1"], x)
    q = linear(params["q"], xn).reshape(B, L, heads, hd)
    if sr_ratio > 1:
        img = xn.reshape(B, H, W, C)
        red = conv2d(params["sr"], img, stride=sr_ratio, padding="VALID")
        red = red.reshape(B, -1, C)
        red = layer_norm(params["sr_norm"], red)
    else:
        red = xn
    kv = linear(params["kv"], red).reshape(B, -1, 2, heads, hd)
    kk, vv = kv[:, :, 0], kv[:, :, 1]
    attn = jnp.einsum("bnhd,bshd->bhns", q * hd ** -0.5, kk,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhns,bshd->bnhd", attn, vv).reshape(B, L, C)
    x = x + linear(params["proj"], out)

    h = layer_norm(params["norm2"], x)
    h = linear(params["fc1"], h)
    h = _dwconv(params["dwconv"], h, H, W)
    h = jax.nn.gelu(h)
    return x + linear(params["fc2"], h)


def init_pvt_v2(key, cfg: PVTv2Config = PVTv2Config(), dtype=jnp.float32):
    keys = jax.random.split(key, 2 * len(cfg.depths) + sum(cfg.depths))
    ki = 0
    stages = []
    in_ch = 3
    for s in range(len(cfg.depths)):
        patch = 7 if s == 0 else 3
        stride = 4 if s == 0 else 2
        stage = {
            "patch_embed": {"proj": conv2d_init(keys[ki], patch, patch, in_ch,
                                                cfg.embed_dims[s], dtype=dtype),
                            "norm": layer_norm_init(cfg.embed_dims[s], dtype)},
            "blocks": [],
            "norm": layer_norm_init(cfg.embed_dims[s], dtype),
        }
        ki += 1
        for d in range(cfg.depths[s]):
            stage["blocks"].append(init_block(
                keys[ki], cfg.embed_dims[s], cfg.num_heads[s],
                cfg.mlp_ratios[s], cfg.sr_ratios[s], dtype))
            ki += 1
        stages.append(stage)
        in_ch = cfg.embed_dims[s]
    return {"stages": stages}


def forward_features(params, images, cfg: PVTv2Config = PVTv2Config()):
    """(N, H, W, 3) -> list of 4 feature maps (N, H_i, W_i, C_i) at strides
    4/8/16/32 (pvt.py forward: per-stage tokens normed then reshaped)."""
    x = images
    outs = []
    for s, stage in enumerate(params["stages"]):
        stride = 4 if s == 0 else 2
        x = conv2d(stage["patch_embed"]["proj"], x, stride=stride)
        N, H, W, C = x.shape
        t = layer_norm(stage["patch_embed"]["norm"], x.reshape(N, H * W, C))
        for bp in stage["blocks"]:
            t = block(bp, t, H, W, heads=cfg.num_heads[s],
                      sr_ratio=cfg.sr_ratios[s])
        t = layer_norm(stage["norm"], t)
        x = t.reshape(N, H, W, C)
        outs.append(x)
    return outs
