"""Converter schema test: a synthetic torch-layout state dict (shapes derived
independently from the config, mirroring the reference module definitions)
must convert into a pytree that exactly matches our init tree in structure and
shape, with transposes applied correctly."""
import numpy as np
import jax
import pytest

from dg_sct_tpu.configs import ave_adapter_dims
from dg_sct_tpu.models import ave
from dg_sct_tpu.utils import torch_convert as TC
from tests.test_ave_model import tiny_cfg


def fake_torch_sd(cfg):
    """Emulates MMIL_Net.state_dict() key/shape schema (net_trans.py:677-845)."""
    rs = np.random.RandomState(0)
    sd = {}

    def add(name, *shape):
        if name.endswith("running_var"):
            # variances must be positive (negative var -> NaN through rsqrt)
            sd[name] = rs.rand(*shape).astype(np.float32) + 0.5
        else:
            sd[name] = rs.randn(*shape).astype(np.float32) * 0.05

    # ---- swin (timm swinv2) ----
    E = cfg.swin.embed_dim
    add("swin.patch_embed.proj.weight", E, 3, 4, 4)
    add("swin.patch_embed.proj.bias", E)
    add("swin.patch_embed.norm.weight", E)
    add("swin.patch_embed.norm.bias", E)
    for s, depth in enumerate(cfg.swin.depths):
        C = cfg.swin.stage_dim(s)
        h = cfg.swin.num_heads[s]
        for b in range(depth):
            p = f"swin.layers.{s}.blocks.{b}"
            add(f"{p}.attn.qkv.weight", 3 * C, C)
            add(f"{p}.attn.q_bias", C)
            add(f"{p}.attn.v_bias", C)
            add(f"{p}.attn.logit_scale", h, 1, 1)
            add(f"{p}.attn.cpb_mlp.0.weight", 512, 2)
            add(f"{p}.attn.cpb_mlp.0.bias", 512)
            add(f"{p}.attn.cpb_mlp.2.weight", h, 512)
            add(f"{p}.attn.proj.weight", C, C)
            add(f"{p}.attn.proj.bias", C)
            for n in ("norm1", "norm2"):
                add(f"{p}.{n}.weight", C)
                add(f"{p}.{n}.bias", C)
            add(f"{p}.mlp.fc1.weight", 4 * C, C)
            add(f"{p}.mlp.fc1.bias", 4 * C)
            add(f"{p}.mlp.fc2.weight", C, 4 * C)
            add(f"{p}.mlp.fc2.bias", C)
        if s < cfg.swin.num_layers - 1:
            add(f"swin.layers.{s}.downsample.reduction.weight", 2 * C, 4 * C)
            add(f"swin.layers.{s}.downsample.norm.weight", 2 * C)
            add(f"swin.layers.{s}.downsample.norm.bias", 2 * C)
    add("swin.norm.weight", cfg.swin.num_features)
    add("swin.norm.bias", cfg.swin.num_features)

    # ---- htsat ----
    E = cfg.htsat.embed_dim
    mel = cfg.htsat.frontend.mel_bins
    add("htsat.patch_embed.proj.weight", E, 1, 4, 4)
    add("htsat.patch_embed.proj.bias", E)
    add("htsat.patch_embed.norm.weight", E)
    add("htsat.patch_embed.norm.bias", E)
    for n in ("weight", "bias", "running_mean", "running_var"):
        add(f"htsat.bn0.{n}", mel)
    for s, depth in enumerate(cfg.htsat.depths):
        C = cfg.htsat.stage_dim(s)
        h = cfg.htsat.num_heads[s]
        ws = min(cfg.htsat.window_size, min(cfg.htsat.stage_resolution(s)))
        for b in range(depth):
            p = f"htsat.layers.{s}.blocks.{b}"
            add(f"{p}.attn.qkv.weight", 3 * C, C)
            add(f"{p}.attn.qkv.bias", 3 * C)
            add(f"{p}.attn.relative_position_bias_table", (2 * ws - 1) ** 2, h)
            add(f"{p}.attn.proj.weight", C, C)
            add(f"{p}.attn.proj.bias", C)
            for n in ("norm1", "norm2"):
                add(f"{p}.{n}.weight", C)
                add(f"{p}.{n}.bias", C)
            add(f"{p}.mlp.fc1.weight", 4 * C, C)
            add(f"{p}.mlp.fc1.bias", 4 * C)
            add(f"{p}.mlp.fc2.weight", C, 4 * C)
            add(f"{p}.mlp.fc2.bias", C)
        if s < cfg.htsat.num_layers - 1:
            add(f"htsat.layers.{s}.downsample.norm.weight", 4 * C)
            add(f"htsat.layers.{s}.downsample.norm.bias", 4 * C)
            add(f"htsat.layers.{s}.downsample.reduction.weight", 2 * C, 4 * C)
    F = cfg.htsat.num_features
    add("htsat.norm.weight", F)
    add("htsat.norm.bias", F)
    from dg_sct_tpu.models.htsat import tscam_freq_bins
    SF = tscam_freq_bins(cfg.htsat)
    add("htsat.tscam_conv.weight", cfg.htsat.num_classes, F, SF, 3)
    add("htsat.tscam_conv.bias", cfg.htsat.num_classes)
    add("htsat.head.weight", cfg.htsat.num_classes, cfg.htsat.num_classes)
    add("htsat.head.bias", cfg.htsat.num_classes)

    # ---- adapters ----
    dims = ave_adapter_dims(cfg.swin, cfg.htsat)
    names = {"audio_adapter_blocks_p1": "a", "vis_adapter_blocks_p1": "v",
             "audio_adapter_blocks_p2": "a", "vis_adapter_blocks_p2": "v"}
    r = cfg.adapter.reduction_factor
    for theirs, kind in names.items():
        for i, (v_dim, v_tok, a_dim, a_tok) in enumerate(dims):
            C, Co = (a_dim, v_dim) if kind == "a" else (v_dim, a_dim)
            N, No = (a_tok, v_tok) if kind == "a" else (v_tok, a_tok)
            p = f"{theirs}.{i}"
            add(f"{p}.conv_adapter.weight", N, No, 1, 1)
            add(f"{p}.conv_adapter.bias", N)
            add(f"{p}.fc.weight", C, Co)
            add(f"{p}.fc.bias", C)
            add(f"{p}.my_tokens", cfg.adapter.num_tokens, C)
            add(f"{p}.gate", 1)
            add(f"{p}.gate_av", 1)
            add(f"{p}.gate_tk", 1)  # exists in ckpt, unused in forward
            for n, o in (("fc_affine_audio_1", C), ("fc_affine_video_1", C),
                         ("fc_affine_bottleneck", C // 2), ("fc_affine_video_2", C // 2),
                         ("fc_affine_audio_2", C // 2), ("fc_affine_v_s_att", 1),
                         ("fc_affine_v_c_att", C)):
                inp = C // 2 if n in ("fc_affine_v_s_att", "fc_affine_v_c_att") else C
                add(f"{p}.{n}.weight", o, inp)
                add(f"{p}.{n}.bias", o)
            add(f"{p}.down_sampler.weight", C // r, C // 2, 1, 1)
            add(f"{p}.up_sampler.weight", C, (C // r) // 2, 1, 1)
            for bn, d in (("bn1", C // r), ("bn2", C)):
                for n in ("weight", "bias", "running_mean", "running_var"):
                    add(f"{p}.{bn}.{n}", d)
            for ln in ("ln_before", "ln_post"):
                add(f"{p}.{ln}.weight", C)
                add(f"{p}.{ln}.bias", C)

    # ---- temporal_attn ----
    vd, ad = cfg.swin.num_features, cfg.htsat.num_features
    add("temporal_attn.v_fc.weight", 512, vd)
    add("temporal_attn.v_fc.bias", 512)
    add("temporal_attn.a_fc.weight", 128, ad)
    add("temporal_attn.a_fc.bias", 128)
    for name, ih, hid in (("audio_rnn", 128, 128), ("visual_rnn", 512, 256)):
        for sfx in ("", "_reverse"):
            add(f"temporal_attn.audio_visual_rnn_layer.{name}.weight_ih_l0{sfx}", 4 * hid, ih)
            add(f"temporal_attn.audio_visual_rnn_layer.{name}.weight_hh_l0{sfx}", 4 * hid, hid)
            add(f"temporal_attn.audio_visual_rnn_layer.{name}.bias_ih_l0{sfx}", 4 * hid)
            add(f"temporal_attn.audio_visual_rnn_layer.{name}.bias_hh_l0{sfx}", 4 * hid)

    def enc_layer(p):
        add(f"{p}.self_attn.in_proj_weight", 768, 256)
        add(f"{p}.self_attn.in_proj_bias", 768)
        add(f"{p}.self_attn.out_proj.weight", 256, 256)
        add(f"{p}.self_attn.out_proj.bias", 256)
        add(f"{p}.linear1.weight", 1024, 256)
        add(f"{p}.linear1.bias", 1024)
        add(f"{p}.linear2.weight", 256, 1024)
        add(f"{p}.linear2.bias", 256)
        for n in ("norm1", "norm2"):
            add(f"{p}.{n}.weight", 256)
            add(f"{p}.{n}.bias", 256)

    for name, ind in (("video_encoder", 512), ("audio_encoder", 256)):
        add(f"temporal_attn.{name}.affine_matrix.weight", 256, ind)
        add(f"temporal_attn.{name}.affine_matrix.bias", 256)
        for i in range(2):
            enc_layer(f"temporal_attn.{name}.encoder.layers.{i}")
    for name, ind in (("video_decoder", 512), ("audio_decoder", 256)):
        add(f"temporal_attn.{name}.affine_matrix.weight", 256, ind)
        add(f"temporal_attn.{name}.affine_matrix.bias", 256)
        p = f"temporal_attn.{name}.decoder.layers.0"
        enc_layer(p)
        add(f"{p}.multihead_attn.in_proj_weight", 768, 256)
        add(f"{p}.multihead_attn.in_proj_bias", 768)
        add(f"{p}.multihead_attn.out_proj.weight", 256, 256)
        add(f"{p}.multihead_attn.out_proj.bias", 256)
    for g in ("audio_gated", "video_gated"):
        add(f"temporal_attn.{g}.0.weight", 1, 256)
        add(f"temporal_attn.{g}.0.bias", 1)

    # ---- CMBS ----
    for inter in ("AVInter", "VAInter"):
        add(f"CMBS.{inter}.video_multihead.in_proj_weight", 768, 256)
        add(f"CMBS.{inter}.video_multihead.in_proj_bias", 768)
        add(f"CMBS.{inter}.video_multihead.out_proj.weight", 256, 256)
        add(f"CMBS.{inter}.video_multihead.out_proj.bias", 256)
        add(f"CMBS.{inter}.norm1.weight", 256)
        add(f"CMBS.{inter}.norm1.bias", 256)
    for n in ("video_cas", "audio_cas"):
        add(f"CMBS.{n}.weight", 28, 256)
        add(f"CMBS.{n}.bias", 28)
    add("CMBS.localize_module.classifier.weight", 1, 256)
    add("CMBS.localize_module.classifier.bias", 1)
    add("CMBS.localize_module.event_classifier.weight", 28, 256)
    add("CMBS.localize_module.event_classifier.bias", 28)
    return sd


def _tree_shapes(tree):
    return {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_convert_matches_init_tree():
    cfg = tiny_cfg()
    init_params, init_state = __import__("dg_sct_tpu.models.ave", fromlist=["ave"]).init_ave_model(
        jax.random.PRNGKey(0), cfg)
    sd = fake_torch_sd(cfg)
    params, state = TC.convert_ave_model(sd, num_adapters=len(
        ave_adapter_dims(cfg.swin, cfg.htsat)))

    a, b = _tree_shapes(init_params), _tree_shapes(params)
    extra_init = {k: v for k, v in a.items() if k not in b or b[k] != v}
    extra_conv = {k: v for k, v in b.items() if k not in a or a[k] != v}
    assert not extra_init, f"missing/mismatched in converted: {list(extra_init)[:8]}"
    assert not extra_conv, f"unexpected in converted: {list(extra_conv)[:8]}"

    # spot-check a transpose: swin qkv kernel == source.T
    src = sd["swin.layers.0.blocks.0.attn.qkv.weight"]
    np.testing.assert_array_equal(params["swin"]["layers"][0]["blocks"][0]["attn"]["qkv"]["kernel"], src.T)
    # grouped conv packing: group 1 of down_sampler
    i = 0
    src = sd[f"audio_adapter_blocks_p1.{i}.down_sampler.weight"][:, :, 0, 0]
    go = src.shape[0] // 2
    np.testing.assert_array_equal(
        params["adapters"]["a_p1"][i]["down"]["kernel"][1], src[go:].T)


def test_convert_model_runs():
    cfg = tiny_cfg()
    from dg_sct_tpu.models import ave as ave_mod
    sd = fake_torch_sd(cfg)
    params, state = TC.convert_ave_model(
        sd, num_adapters=len(ave_adapter_dims(cfg.swin, cfg.htsat)))
    wave = np.zeros((1, cfg.num_frames, cfg.htsat.frontend.clip_samples), np.float32)
    imgs = np.zeros((1, cfg.num_frames, 64, 64, 3), np.float32)
    import jax.numpy as jnp
    out, _ = ave_mod.forward(jax.tree_util.tree_map(jnp.asarray, params),
                             jax.tree_util.tree_map(jnp.asarray, state),
                             jnp.asarray(wave), jnp.asarray(imgs), cfg, train=False)
    assert np.isfinite(np.asarray(out["event_scores"])).all()
