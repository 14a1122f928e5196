"""PVT-v2 (Pyramid Vision Transformer v2) backbone.

Rebuild of `avs_scripts/avs_s4/model/pvt.py:15-422`. NOTE: the reference
instantiates PVT-v2-b5 and loads its ImageNet weights for AVS
(PVT_AVSModel.py:628, 968-977) but its forward is bypassed — the live
multi-scale features come from Swin (PVT_AVSModel.py:892-916). Implemented at
full fidelity for checkpoint/interface completeness:

  * overlapping patch embeds (7x7/s4 then 3x3/s2, torch-exact patch//2
    padding — SAME padding is asymmetric for these shapes and would
    misalign loaded checkpoints; pvt.py:177-216);
  * pre-norm blocks (LN eps 1e-6, pvt.py:380,418) with spatial-reduction
    attention — strided-conv SRA (pvt.py:106-112) or the *linear* SRA of
    the `_li` variants (adaptive 7x7 pool + 1x1 conv + LN + GELU,
    pvt.py:115-119);
  * DWConv MLPs (pvt.py:315-326), with the linear variants' extra ReLU
    after fc1 (pvt.py:48-50);
  * stochastic depth linearly spaced over the total depth (pvt.py:244-246);
  * every published size preset b0..b5 + b2_li (pvt.py:341-422).

The classification head is omitted exactly as the reference leaves it
(commented out, pvt.py:253,309); `forward_features` returns the 4-scale
pyramid. Features are channels-last (N,H,W,C) — TPU-idiomatic — where the
reference permutes to NCHW (pvt.py:304).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.basic import (conv2d, conv2d_init, drop_path, layer_norm,
                         layer_norm_init, linear, linear_init)


@dataclasses.dataclass(frozen=True)
class PVTv2Config:
    img_size: int = 224
    embed_dims: tuple = (64, 128, 320, 512)
    depths: tuple = (3, 6, 40, 3)       # b5 (pvt.py:415)
    num_heads: tuple = (1, 2, 5, 8)
    mlp_ratios: tuple = (4, 4, 4, 4)
    sr_ratios: tuple = (8, 4, 2, 1)
    drop_path_rate: float = 0.1         # b5 (pvt.py:416)
    linear_sra: bool = False            # `_li` variants (pvt.py:59,74-80)
    ln_eps: float = 1e-6                # partial(nn.LayerNorm, eps=1e-6)


def _preset(**defaults):
    def make(**kw):                      # explicit kwargs override the preset
        return PVTv2Config(**{**defaults, **kw})
    return make


pvt_v2_b0 = _preset(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                    mlp_ratios=(8, 8, 4, 4))
pvt_v2_b1 = _preset(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
                    mlp_ratios=(8, 8, 4, 4))
pvt_v2_b2 = _preset(depths=(3, 4, 6, 3))
pvt_v2_b2_li = _preset(depths=(3, 4, 6, 3), linear_sra=True)
pvt_v2_b3 = _preset(depths=(3, 4, 18, 3))
pvt_v2_b4 = _preset(depths=(3, 8, 27, 3))
pvt_v2_b5 = _preset(depths=(3, 6, 40, 3))


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


def _adaptive_avg_pool(x, out_hw):
    """torch AdaptiveAvgPool2d semantics: output cell (i, j) averages input
    rows [floor(i*H/o), ceil((i+1)*H/o)) x the analogous columns. Static
    shapes -> unrolled 7x7 slice means (the linear-SRA path only)."""
    B, H, W, C = x.shape
    o = out_hw
    rows = []
    for i in range(o):
        r0, r1 = (i * H) // o, -(-((i + 1) * H) // o)
        cols = []
        for j in range(o):
            c0, c1 = (j * W) // o, -(-((j + 1) * W) // o)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)                      # (B, o, o, C)


def init_block(key, dim, heads, mlp_ratio, sr_ratio, *, linear_sra=False,
               dtype=jnp.float32):
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
    if linear_sra:
        # pool(7) -> 1x1 conv -> LN -> GELU regardless of sr_ratio
        # (pvt.py:74-80)
        p["sr"] = conv2d_init(k[6], 1, 1, dim, dim, dtype=dtype)
        p["sr_norm"] = layer_norm_init(dim, dtype)
    elif sr_ratio > 1:
        p["sr"] = conv2d_init(k[6], sr_ratio, sr_ratio, dim, dim, dtype=dtype)
        p["sr_norm"] = layer_norm_init(dim, dtype)
    return p


def block(params, x, H, W, *, heads, sr_ratio, linear_sra=False, eps=1e-6,
          dpr=0.0, train=False, rng=None):
    B, L, C = x.shape
    hd = C // heads
    xn = layer_norm(params["norm1"], x, eps=eps)
    q = linear(params["q"], xn).reshape(B, L, heads, hd)
    if linear_sra:
        img = xn.reshape(B, H, W, C)
        red = conv2d(params["sr"], _adaptive_avg_pool(img, 7), stride=1)
        red = layer_norm(params["sr_norm"], red.reshape(B, -1, C), eps=eps)
        red = jax.nn.gelu(red, approximate=False)
    elif sr_ratio > 1:
        img = xn.reshape(B, H, W, C)
        red = conv2d(params["sr"], img, stride=sr_ratio, padding="VALID")
        red = red.reshape(B, -1, C)
        red = layer_norm(params["sr_norm"], red, eps=eps)
    else:
        red = xn
    kv = linear(params["kv"], red).reshape(B, -1, 2, heads, hd)
    kk, vv = kv[:, :, 0], kv[:, :, 1]
    attn = jnp.einsum("bnhd,bshd->bhns", q * hd ** -0.5, kk,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhns,bshd->bnhd", attn, vv).reshape(B, L, C)
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    x = x + drop_path(r1, linear(params["proj"], out), dpr, train)

    h = layer_norm(params["norm2"], x, eps=eps)
    h = linear(params["fc1"], h)
    if linear_sra:                       # Mlp(linear=True): ReLU before the
        h = jax.nn.relu(h)               # DWConv (pvt.py:48-50)
    h = _dwconv(params["dwconv"], h, H, W)
    h = jax.nn.gelu(h, approximate=False)
    return x + drop_path(r2, linear(params["fc2"], h), dpr, train)


def init_pvt_v2(key, cfg: PVTv2Config = PVTv2Config(), dtype=jnp.float32):
    keys = jax.random.split(key, 2 * len(cfg.depths) + sum(cfg.depths))
    ki = 0
    stages = []
    in_ch = 3
    for s in range(len(cfg.depths)):
        patch = 7 if s == 0 else 3
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
                cfg.mlp_ratios[s], cfg.sr_ratios[s],
                linear_sra=cfg.linear_sra, dtype=dtype))
            ki += 1
        stages.append(stage)
        in_ch = cfg.embed_dims[s]
    return {"stages": stages}


def forward_features(params, images, cfg: PVTv2Config = PVTv2Config(), *,
                     train=False, rng=None):
    """(N, H, W, 3) -> list of 4 feature maps (N, H_i, W_i, C_i) at strides
    4/8/16/32 (pvt.py:291-306: per-stage tokens normed then reshaped).

    Stochastic-depth rates are linearly spaced 0 -> cfg.drop_path_rate over
    the total depth (pvt.py:244-246); active only with train=True + rng."""
    x = images
    outs = []
    total = sum(cfg.depths)
    dprs = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    cur = 0
    for s, stage in enumerate(params["stages"]):
        patch = 7 if s == 0 else 3
        stride = 4 if s == 0 else 2
        pad = patch // 2                 # torch-exact OverlapPatchEmbed
        x = conv2d(stage["patch_embed"]["proj"], x, stride=stride,
                   padding=((pad, pad), (pad, pad)))
        N, H, W, C = x.shape
        t = layer_norm(stage["patch_embed"]["norm"], x.reshape(N, H * W, C),
                       eps=cfg.ln_eps)
        for bi, bp in enumerate(stage["blocks"]):
            brng = (jax.random.fold_in(rng, cur + bi)
                    if rng is not None else None)
            t = block(bp, t, H, W, heads=cfg.num_heads[s],
                      sr_ratio=cfg.sr_ratios[s], linear_sra=cfg.linear_sra,
                      eps=cfg.ln_eps, dpr=dprs[cur + bi], train=train,
                      rng=brng)
        cur += cfg.depths[s]
        t = layer_norm(stage["norm"], t, eps=cfg.ln_eps)
        x = t.reshape(N, H, W, C)
        outs.append(x)
    return outs
