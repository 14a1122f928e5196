"""AVS segmentation model — the `Pred_endecoder` equivalent
(`DG-SCT/AVS/avs_scripts/avs_s4/model/PVT_AVSModel.py:584-988`).

Pipeline: 224^2 frames bicubic-resized to 192^2 -> interleaved dual-tower
encoder with per-stage taps -> per-scale linear to 256ch + bicubic resize onto
the PVT grid (56/28/14/7) -> 4-scale TemporalAttention gates -> TPAVI
non-local AV attention per stage -> FPN decoder (FeatureFusionBlocks) ->
output conv -> (B*T, 224, 224, 1) mask logits.

Note the reference also instantiates PVT-v2-b5 and VGGish but both are
bypassed on the live path (SURVEY.md §2.4); we implement only the live path.
Channels-last everywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AVSModelConfig
from ..ops import dsp
from ..ops.basic import conv2d, conv2d_init, linear, linear_init
from . import htsat as H
from . import interleave as I
from . import swinv2 as S
from . import tpavi as TP
from .heads import avs as avs_head


# ---------------------------------------------------------------------------
# FPN pieces (PVT_AVSModel.py:349-412)
# ---------------------------------------------------------------------------

def init_residual_conv_unit(key, ch, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"conv1": conv2d_init(k1, 3, 3, ch, ch, dtype=dtype),
            "conv2": conv2d_init(k2, 3, 3, ch, ch, dtype=dtype)}


def residual_conv_unit(params, x):
    out = jax.nn.relu(x)
    out = conv2d(params["conv1"], out)
    out = jax.nn.relu(out)
    out = conv2d(params["conv2"], out)
    return out + x


def init_feature_fusion_block(key, ch, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"res1": init_residual_conv_unit(k1, ch, dtype),
            "res2": init_residual_conv_unit(k2, ch, dtype)}


def feature_fusion_block(params, x, skip=None):
    """FeatureFusionBlock: optional skip add -> RCU -> 2x bilinear up
    (align_corners=True)."""
    out = x
    if skip is not None:
        out = out + residual_conv_unit(params["res1"], skip)
    out = residual_conv_unit(params["res2"], out)
    H_, W_ = out.shape[1], out.shape[2]
    return dsp.resize_2d(out, 2 * H_, 2 * W_, kernel="linear", align_corners=True)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def init_avs_model(key, cfg: AVSModelConfig, dtype=jnp.float32):
    k = jax.random.split(key, 20)
    swin_params = S.init_swinv2(k[0], cfg.swin, dtype)
    htsat_params, htsat_state = H.init_htsat(k[1], cfg.htsat, dtype)
    adapter_params, adapter_state = I.init_adapters(k[2], cfg, dtype)
    ch = cfg.channel
    params = {
        "swin": swin_params,
        "htsat": htsat_params,
        "adapters": adapter_params,
        # per-stage channel alignment (x{i}_linear_, PVT_AVSModel.py:621-624)
        "scale_linears": [linear_init(k[3 + i], cfg.swin.stage_dim(i), ch, dtype=dtype)
                          for i in range(4)],
        "audio_linear": linear_init(k[7], cfg.htsat.num_features, ch // 2, dtype=dtype),
        "temporal_attn": avs_head.init_avs_temporal_attention(k[8], ch, dtype),
        "paths": [init_feature_fusion_block(k[9 + i], ch, dtype) for i in range(4)],
        "out_conv1": conv2d_init(k[13], 3, 3, ch, 128, dtype=dtype),
        "out_conv2": conv2d_init(k[14], 3, 3, 128, 32, dtype=dtype),
        "out_conv3": conv2d_init(k[15], 1, 1, 32, 1, dtype=dtype),
    }
    state = {"htsat": htsat_state, "adapters": adapter_state, "tpavi": {}}
    tp = {}
    for i in cfg.tpavi_stages:
        tp_p, tp_s = TP.init_tpavi(k[16 + (i % 4)], ch, dtype)
        tp[f"tpavi_b{i + 1}"] = tp_p
        state["tpavi"][f"tpavi_b{i + 1}"] = tp_s
    params["tpavi"] = tp
    return params, state


def forward(params, state, images, wave, cfg: AVSModelConfig, *, train=False,
            rng=None, mixup_lambda=None):
    """images: (B, T, H, W, 3) at mask_size (224); wave: (B, T, L).

    Returns (out dict with 'pred' (B*T, 224, 224, 1) logits, feature_map_list,
    a_fea_list, new_state).
    """
    B, T = images.shape[0], images.shape[1]
    imgs = images.reshape((B * T,) + images.shape[2:])
    # 224 -> 192 bicubic (PVT_AVSModel.py:790; F.interpolate default
    # align_corners=False)
    imgs = dsp.resize_2d(imgs, cfg.swin.img_size, cfg.swin.img_size,
                         kernel="cubic", align_corners=False)
    wave_f = wave.reshape(B * T, -1)

    feats, new_state = I.forward(params, state, wave_f, imgs, cfg, train=train,
                                 rng=rng, mixup_lambda=mixup_lambda,
                                 return_stage_taps=True)
    new_state = dict(new_state)

    # audio: spatial-map pooled + linear -> (B, T, 128)
    audio_feature = feats["f_a"][:, 0, :].reshape(B, T, -1)
    audio_feature = linear(params["audio_linear"], audio_feature)

    # multi-scale taps -> 256ch -> pvt grid (align_corners=False bicubic)
    maps = []
    for i, tap in enumerate(feats["stage_taps"]):
        r = cfg.swin.stage_resolution(i)[0]
        x = tap.reshape(tap.shape[0], r, r, -1)
        x = linear(params["scale_linears"][i], x)
        sz = cfg.scale_sizes[i]
        x = dsp.resize_2d(x, sz, sz, kernel="cubic", align_corners=False)
        maps.append(x)

    maps, audio_flat = avs_head.avs_temporal_attention(
        params["temporal_attn"], maps, audio_feature, num_frames=T,
        train=train, rng=rng)

    a_fea_list = [None] * 4
    new_state["tpavi"] = dict(state["tpavi"])
    for i in cfg.tpavi_stages:
        name = f"tpavi_b{i + 1}"
        fm = maps[i]
        BT, Hi, Wi, C = fm.shape
        acc = jnp.zeros_like(fm)
        count = 0
        x5 = fm.reshape(B, T, Hi, Wi, C)
        if cfg.tpavi_vv_flag:
            z, _, st = TP.tpavi(params["tpavi"][name], state["tpavi"][name],
                                x5, None, train=train)
            acc = acc + z.reshape(BT, Hi, Wi, C)
            new_state["tpavi"][name] = st
            count += 1
        if cfg.tpavi_va_flag:
            audio_t = audio_flat.reshape(B, T, -1)
            z, a_fea, st = TP.tpavi(params["tpavi"][name], state["tpavi"][name],
                                    x5, audio_t, train=train)
            acc = acc + z.reshape(BT, Hi, Wi, C)
            new_state["tpavi"][name] = st
            a_fea_list[i] = a_fea
            count += 1
        maps[i] = acc / count

    # FPN decoder: paths indexed 4..1 in the reference (path4 -> params["paths"][3])
    conv4 = feature_fusion_block(params["paths"][3], maps[3])          # 14
    conv43 = feature_fusion_block(params["paths"][2], conv4, maps[2])  # 28
    conv432 = feature_fusion_block(params["paths"][1], conv43, maps[1])  # 56
    conv4321 = feature_fusion_block(params["paths"][0], conv432, maps[0])  # 112

    y = conv2d(params["out_conv1"], conv4321)
    y = dsp.resize_2d(y, cfg.mask_size, cfg.mask_size, kernel="linear",
                      align_corners=False)
    y = jax.nn.relu(conv2d(params["out_conv2"], y))
    pred = conv2d(params["out_conv3"], y)                              # (BT,224,224,1)

    out = {"pred": pred, "feature_map_list": maps, "a_fea_list": a_fea_list}
    return out, new_state
