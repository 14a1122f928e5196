"""HTS-AT audio Swin tower (frozen backbone).

TPU-native rebuild of `HTSAT_Swin_Transformer` (`DG-SCT/AVE/nets/htsat.py:370-826`):
pre-norm V1 Swin blocks with relative-position-bias window attention, patch
merging between stages, and the token-semantic (tscam) classification head.

The tower exposes *externally driveable* per-block functions so the DG-SCT
interleave loop (`net_trans.py:878-917`) can inject adapters between blocks —
but here that is explicit API, not private-attribute poking.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import HTSATConfig
from ..ops import dsp
from ..ops.basic import (batch_norm, batch_norm_init, drop_path, layer_norm,
                         layer_norm_init, linear, linear_init, mlp, mlp_init,
                         patch_embed, patch_embed_init)
from ..ops.windows import (attention_v1_init, shifted_window_attention,
                           window_attention_v1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_block(key, dim, heads, ws, mlp_ratio, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": layer_norm_init(dim, dtype),
        "attn": attention_v1_init(k1, dim, ws, heads, dtype=dtype),
        "norm2": layer_norm_init(dim, dtype),
        "mlp": mlp_init(k2, dim, int(dim * mlp_ratio), dtype=dtype),
    }


def init_htsat(key, cfg: HTSATConfig, dtype=jnp.float32):
    """Returns (params, state). state carries bn0 running stats."""
    keys = jax.random.split(key, 8)
    params = {"patch_embed": patch_embed_init(keys[0], cfg.patch_size, cfg.in_chans,
                                              cfg.embed_dim, norm=cfg.patch_norm, dtype=dtype)}
    bn0_p, bn0_s = batch_norm_init(cfg.frontend.mel_bins, dtype)
    params["bn0"] = bn0_p
    state = {"bn0": bn0_s}

    layers = []
    bkeys = jax.random.split(keys[1], sum(cfg.depths))
    bi = 0
    for s in range(cfg.num_layers):
        dim = cfg.stage_dim(s)
        res = cfg.stage_resolution(s)
        ws = min(cfg.window_size, min(res))
        blocks = []
        for d in range(cfg.depths[s]):
            blocks.append(init_block(bkeys[bi], dim, cfg.num_heads[s], ws, cfg.mlp_ratio, dtype))
            bi += 1
        stage = {"blocks": blocks}
        if s < cfg.num_layers - 1:
            kd = jax.random.split(keys[2 + s])[0]
            stage["downsample"] = {
                "norm": layer_norm_init(4 * dim, dtype),
                "reduction": {"kernel": jax.random.normal(kd, (4 * dim, 2 * dim), dtype) * 0.02},
            }
        layers.append(stage)
    params["layers"] = layers
    params["norm"] = layer_norm_init(cfg.num_features, dtype)

    # tscam head (htsat.py:536-543): Conv2d(num_features, classes, (SF, 3), pad (0,1))
    SF = tscam_freq_bins(cfg)
    kt, kh = jax.random.split(keys[6])
    params["tscam_conv"] = {
        "kernel": jax.random.normal(kt, (SF, 3, cfg.num_features, cfg.num_classes), dtype) * 0.02,
        "bias": jnp.zeros((cfg.num_classes,), dtype),
    }
    params["head"] = linear_init(kh, cfg.num_classes, cfg.num_classes, dtype=dtype)
    return params, state


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def tscam_freq_bins(cfg: HTSATConfig) -> int:
    """c_freq_bin of the tscam fold (htsat.py:628): grid rows / freq_ratio,
    clamped so tiny test configs (grid < freq_ratio) stay well-formed."""
    grid = cfg.spec_size // (2 ** (cfg.num_layers - 1)) // cfg.patch_stride[0]
    return max(grid // cfg.frontend.freq_ratio, 1)


def frontend(params, state, wave, cfg: HTSATConfig, *, train: bool,
             rng=None, mixup_lambda=None):
    """wave (N, L) -> patch tokens (N, 4096, E), plus new bn0 state.

    Pipeline per `net_trans.py:857-876`: spectrogram -> logmel -> bn0 (over the
    mel axis) -> [train: SpecAugment, mixup] -> reshape_wav2img -> patch_embed.
    """
    fcfg = cfg.frontend
    from ..ops import ablate
    if ablate.on("frontend"):  # perf knockout only (ops/ablate.py)
        spec = cfg.spec_size
        img = jnp.broadcast_to(
            jnp.mean(wave, axis=-1)[:, None, None, None],
            (wave.shape[0], spec, spec, 1))
        img = img.astype(params["patch_embed"]["kernel"].dtype)
        tokens = patch_embed(params["patch_embed"], img, cfg.patch_size)
        return tokens, {"bn0": state["bn0"]}
    x, new_state = mel_features(params, state, wave, cfg, train=train,
                                rng=rng, mixup_lambda=mixup_lambda)
    return tokens_from_mel(params, x, cfg), new_state


def mel_features(params, state, wave, cfg: HTSATConfig, *, train: bool,
                 rng=None, mixup_lambda=None):
    """wave (N, L) -> (N, T, mel) post bn0/SpecAug/mixup (htsat.py:755-763)."""
    fcfg = cfg.frontend
    power = dsp.power_spectrogram(wave, fcfg, fcfg.stft_compute)
    x = dsp.logmel(power, fcfg)                      # (N, T, mel)
    # bn0 normalizes the mel axis (htsat.py:757-759 transpose trick)
    x, bn0_state = batch_norm(params["bn0"], state["bn0"], x, train=train, axis=-1)
    if train and rng is not None:
        x = dsp.spec_augment(rng, x, fcfg)
    if train and mixup_lambda is not None:
        x = dsp.do_mixup(x, mixup_lambda)
    return x, {"bn0": bn0_state}


def tokens_from_mel(params, x, cfg: HTSATConfig):
    """(N, T, mel) -> patch tokens via reshape_wav2img + patch_embed."""
    img = dsp.reshape_wav2img(x, cfg.frontend)       # (N, spec, spec, 1)
    # DSP runs in f32 for log-domain accuracy; the tower runs in the params'
    # compute dtype (bf16 on TPU) — cast at the boundary.
    img = img.astype(params["patch_embed"]["kernel"].dtype)
    return patch_embed(params["patch_embed"], img, cfg.patch_size)


def block(params, x, *, dim, heads, res, ws, shift, drop_path_rate=0.0,
          train=False, rng=None):
    """Pre-norm V1 Swin block (htsat.py:210-251). x: (N, L, C)."""
    from ..ops.windows import fused_block_eligible, fused_half_block

    if fused_block_eligible(dim, heads, train):
        x = fused_half_block(params, x, kind="v1", heads=heads, res=res,
                             ws=ws, shift=shift)
        return x + mlp(params["mlp"], layer_norm(params["norm2"], x))
    H, W = res
    shortcut = x
    xn = layer_norm(params["norm1"], x)
    attn_out = shifted_window_attention(
        lambda w, m, nw: window_attention_v1(params["attn"], w, num_heads=heads, ws=ws, mask=m, nW=nw),
        xn, H=H, W=W, ws=ws, shift=shift)
    dp_static_zero = isinstance(drop_path_rate, (int, float)) and drop_path_rate == 0.0
    if train and rng is not None and not dp_static_zero:
        r1, r2 = jax.random.split(rng)
        x = shortcut + drop_path(r1, attn_out, drop_path_rate, train)
        x = x + drop_path(r2, mlp(params["mlp"], layer_norm(params["norm2"], x)), drop_path_rate, train)
    else:
        x = shortcut + attn_out
        x = x + mlp(params["mlp"], layer_norm(params["norm2"], x))
    return x


def patch_merging(params, x, res):
    """V1 patch merging (htsat.py:259-298): norm(4C) then reduction."""
    H, W = res
    B, L, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    # cat order [x0, x1, x2, x3] = [(0,0), (1,0), (0,1), (1,1)] over (h, w)
    x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                         x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
    x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
    x = layer_norm(params["norm"], x)
    return linear(params["reduction"], x)


def block_plan(cfg: HTSATConfig):
    """Static per-stage block metadata: (dim, heads, res, ws, shift, dpr)."""
    total = sum(cfg.depths)
    dprs = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    plan, bi = [], 0
    for s in range(cfg.num_layers):
        res = cfg.stage_resolution(s)
        ws = min(cfg.window_size, min(res))
        stage = []
        for d in range(cfg.depths[s]):
            # shift disabled when the window covers the whole input (htsat.py:164-167)
            shift = 0 if min(res) <= cfg.window_size else (0 if d % 2 == 0 else ws // 2)
            stage.append(dict(dim=cfg.stage_dim(s), heads=cfg.num_heads[s], res=res,
                              ws=ws, shift=shift, dpr=dprs[bi]))
            bi += 1
        plan.append(stage)
    return plan


def forward_features(params, state, wave, cfg: HTSATConfig, *, train=False,
                     rng=None, mixup_lambda=None):
    """Standalone full tower (no adapters): wave -> final tokens (N, 64, 768).

    Used by tests and by AVQA's grounding stage (which runs HTS-AT standalone,
    `grounding_gen/nets_grd_gen.py:141-145`).
    """
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    x, new_state = frontend(params, state, wave, cfg, train=train, rng=rngs[0],
                            mixup_lambda=mixup_lambda)
    return run_tower(params, x, cfg, train=train), new_state


def run_tower(params, x, cfg: HTSATConfig, *, train=False):
    """Patch tokens -> final tokens through all stages (no adapters)."""
    plan = block_plan(cfg)
    for s, stage in enumerate(plan):
        for d, meta in enumerate(stage):
            x = block(params["layers"][s]["blocks"][d], x, dim=meta["dim"],
                      heads=meta["heads"], res=meta["res"], ws=meta["ws"],
                      shift=meta["shift"], drop_path_rate=meta["dpr"], train=train,
                      rng=None)
        if "downsample" in params["layers"][s]:
            x = patch_merging(params["layers"][s]["downsample"], x, meta["res"])
    return x


def classifier_forward(params, state, wave, cfg: HTSATConfig, *, train=False,
                       rng=None, mixup_lambda=None):
    """Standalone HTS-AT classifier incl. the LONG-CLIP branches
    (htsat.py:752-826). DG-SCT's 1-s segments (mel T=1001 <= 1024) always
    take the interpolate path — frontend -> tower -> tscam_head — but longer
    audio reproduces `crop_wav`: train = ONE random crop to target_t
    (htsat.py:798-801); eval = sliding crops of (T-1)//2 frames at
    (T-1)//4 overlap with OUTPUT-level averaging (htsat.py:802-821).
    """
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    x, new_state = mel_features(params, state, wave, cfg, train=train,
                                rng=rngs[0], mixup_lambda=mixup_lambda)
    target = cfg.frontend.target_t
    T = x.shape[1]
    if T <= target:
        toks = run_tower(params, tokens_from_mel(params, x, cfg), cfg,
                         train=train)
        return tscam_head(params, toks, cfg), new_state
    if train:
        crop_rng = rngs[1] if rngs[1] is not None else jax.random.PRNGKey(0)
        pos = jax.random.randint(crop_rng, (x.shape[0],), 0, T - target)
        toks = run_tower(
            params,
            tokens_from_mel(params, dsp.crop_mel(x, pos, target), cfg),
            cfg, train=True)
        return tscam_head(params, toks, cfg), new_state
    positions, crop = dsp.long_clip_eval_positions(T)
    # the reference's own bound: each crop must fit reshape_wav2img's
    # T <= target assert (htsat.py:723), so eval handles T <= 2*target+1
    assert crop <= target, (
        f"mel T={T} > {2 * target + 1}: the reference's sliding-crop eval "
        f"(htsat.py:804-808) only covers T <= 2*target_t+1")
    outs = []
    for p in positions:
        xc = dsp.crop_mel(
            x, jnp.full((x.shape[0],), p, jnp.int32), crop)
        toks = run_tower(params, tokens_from_mel(params, xc, cfg), cfg,
                         train=False)
        outs.append(tscam_head(params, toks, cfg))
    avg = lambda k: sum(o[k] for o in outs) / len(outs)
    return {k: avg(k) for k in outs[0]}, new_state


def tscam_head(params, x, cfg: HTSATConfig):
    """Token-semantic head (htsat.py:619-685): tokens -> clipwise logits.

    x: (N, 64, 768) final tokens on an 8x8 grid (freq-folded layout).
    """
    N, L, C = x.shape
    x = layer_norm(params["norm"], x)
    SF = ST = cfg.stage_resolution(cfg.num_layers - 1)[0]  # 8
    cfb = tscam_freq_bins(cfg)                             # c_freq_bin = 2
    fr = SF // cfb
    # (N, L, C) -> grid (N, SF, ST, C) -> unfold freq strips -> (N, cfb, fr*ST, C)
    g = x.reshape(N, SF, ST, C)
    g = g.reshape(N, fr, cfb, ST, C).transpose(0, 2, 1, 3, 4).reshape(N, cfb, fr * ST, C)
    latent = jnp.mean(g.reshape(N, -1, C), axis=1)
    # tscam conv: kernel (cfb, 3, C, classes), pad time by 1
    gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        gp, params["tscam_conv"]["kernel"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + params["tscam_conv"]["bias"]          # (N, 1, T', classes)
    clipwise = jnp.mean(out[:, 0], axis=1)            # (N, classes)
    # framewise upsampled by interpolate-ratio 8*patch_stride (htsat.py:663)
    framewise = jnp.repeat(jax.nn.sigmoid(out[:, 0]), 8 * cfg.patch_stride[1], axis=1)
    return {"clipwise_output": jax.nn.sigmoid(clipwise),
            "framewise_output": framewise,
            "latent_output": latent}
