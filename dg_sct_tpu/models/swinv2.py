"""Swin-V2-Large visual tower (frozen backbone).

Matches timm 0.6.12 `swinv2_large_window12_192_22k` semantics exactly so the
released checkpoint ports weight-for-weight:
  * POST-norm residuals: `x = x + drop_path(norm(f(x)))` — exercised externally
    by the reference interleave at `DG-SCT/AVE/nets/net_trans.py:894-903`;
  * scaled-cosine window attention with clamped learnable logit scale;
  * log-spaced continuous-position-bias MLP (log-CPB);
  * V2 patch merging: `reduction(4C -> 2C)` **then** `norm(2C)`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import SwinV2Config
from ..ops.basic import (drop_path, layer_norm, layer_norm_init, linear, mlp,
                         mlp_init, patch_embed, patch_embed_init)
from ..ops.windows import (attention_v2_init, shifted_window_attention,
                           window_attention_v2)


def init_block(key, dim, heads, mlp_ratio, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "attn": attention_v2_init(k1, dim, heads, dtype=dtype),
        "norm1": layer_norm_init(dim, dtype),
        "mlp": mlp_init(k2, dim, int(dim * mlp_ratio), dtype=dtype),
        "norm2": layer_norm_init(dim, dtype),
    }


def init_swinv2(key, cfg: SwinV2Config, dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    params = {"patch_embed": patch_embed_init(keys[0], cfg.patch_size, cfg.in_chans,
                                              cfg.embed_dim, norm=True, dtype=dtype)}
    layers = []
    bkeys = jax.random.split(keys[1], sum(cfg.depths))
    bi = 0
    for s in range(cfg.num_layers):
        dim = cfg.stage_dim(s)
        blocks = []
        for d in range(cfg.depths[s]):
            blocks.append(init_block(bkeys[bi], dim, cfg.num_heads[s], cfg.mlp_ratio, dtype))
            bi += 1
        stage = {"blocks": blocks}
        if s < cfg.num_layers - 1:
            kd = jax.random.split(keys[2], cfg.num_layers)[s]
            stage["downsample"] = {
                "reduction": {"kernel": jax.random.normal(kd, (4 * dim, 2 * dim), dtype) * 0.02},
                "norm": layer_norm_init(2 * dim, dtype),
            }
        layers.append(stage)
    params["layers"] = layers
    params["norm"] = layer_norm_init(cfg.num_features, dtype)
    return params


def block_plan(cfg: SwinV2Config):
    """Static per-block metadata mirroring timm's constructor."""
    total = sum(cfg.depths)
    dprs = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    plan, bi = [], 0
    for s in range(cfg.num_layers):
        res = cfg.stage_resolution(s)
        ws = min(cfg.window_size, min(res))
        stage = []
        for d in range(cfg.depths[s]):
            shift = 0 if min(res) <= cfg.window_size else (0 if d % 2 == 0 else ws // 2)
            stage.append(dict(dim=cfg.stage_dim(s), heads=cfg.num_heads[s], res=res,
                              ws=ws, shift=shift, dpr=dprs[bi],
                              pretrained_ws=cfg.pretrained_window_sizes[s]))
            bi += 1
        plan.append(stage)
    return plan


def attn_part(params, x, meta, *, train=False, rng=None):
    """The spatial-attention half of a block — the analogue of timm's
    `blk._attn(x)` that the interleave loop drives directly (net_trans.py:894).
    Returns attention output BEFORE norm1/residual. x: (N, L, C)."""
    H, W = meta["res"]
    return shifted_window_attention(
        lambda w, m, nw: window_attention_v2(params["attn"], w, num_heads=meta["heads"],
                                             ws=meta["ws"], mask=m, nW=nw,
                                             pretrained_ws=meta["pretrained_ws"]),
        x, H=H, W=W, ws=meta["ws"], shift=meta["shift"])


def block(params, x, meta, *, train=False, rng=None, dpr=None):
    """Full post-norm V2 block: x += dp(norm1(attn(x))); x += dp(norm2(mlp(x))).

    `dpr` overrides meta["dpr"]; it may be a traced scalar (lax.scan over
    blocks with per-iteration drop-path rates)."""
    from ..ops.windows import fused_block_eligible, fused_half_block

    rate = meta["dpr"] if dpr is None else dpr
    if fused_block_eligible(meta["dim"], meta["heads"], train):
        x = fused_half_block(params, x, kind="v2", heads=meta["heads"],
                             res=meta["res"], ws=meta["ws"],
                             shift=meta["shift"],
                             pretrained_ws=meta["pretrained_ws"])
        return x + layer_norm(params["norm2"], mlp(params["mlp"], x))
    a = layer_norm(params["norm1"], attn_part(params, x, meta))
    static_zero = isinstance(rate, (int, float)) and rate == 0.0
    if train and rng is not None and not static_zero:
        r1, r2 = jax.random.split(rng)
        x = x + drop_path(r1, a, rate, train)
        b = layer_norm(params["norm2"], mlp(params["mlp"], x))
        x = x + drop_path(r2, b, rate, train)
    else:
        x = x + a
        x = x + layer_norm(params["norm2"], mlp(params["mlp"], x))
    return x


def patch_merging(params, x, res):
    """V2 patch merging: cat 4 -> Linear(4C, 2C, no bias) -> LayerNorm(2C)."""
    H, W = res
    B, L, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                         x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
    x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
    x = linear(params["reduction"], x)
    return layer_norm(params["norm"], x)


def patch_embed_tokens(params, images, cfg: SwinV2Config):
    """(N, H, W, 3) -> (N, 2304, 192) patch tokens (net_trans.py:855)."""
    return patch_embed(params["patch_embed"], images, cfg.patch_size)


def forward_features(params, images, cfg: SwinV2Config, *, train=False, rng=None):
    """Standalone tower (no adapters): (N, H, W, 3) -> (N, 36, 1536) tokens.

    Used by AVQA's negative-branch path (`net_avst.py:502-505`) and tests.
    """
    x = patch_embed(params["patch_embed"], images, cfg.patch_size)
    for s, stage in enumerate(block_plan(cfg)):
        for d, meta in enumerate(stage):
            x = block(params["layers"][s]["blocks"][d], x, meta, train=train)
        if "downsample" in params["layers"][s]:
            x = patch_merging(params["layers"][s]["downsample"], x, meta["res"])
    return layer_norm(params["norm"], x)
