"""HuggingFace `transformers` checkpoint import.

The reference builds its visual tower from timm
(`net_trans.py:693: timm.create_model('swinv2_large_window12_192_22k')`) and
its CLIP from the vendored OpenAI weights. Neither timm nor the original
checkpoint files exist in this environment, but `transformers` ships
independent implementations of the same architectures — these converters map
a `transformers` state dict onto our param trees, giving a REAL pretrained
init path (e.g. `microsoft/swinv2-large-patch4-window12-192-22k`,
`openai/clip-vit-base-patch32`) plus the backbone of the third-party parity
tests (`tests/test_third_party_parity.py`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _npify(state_dict):
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def swinv2_from_transformers(hf, cfg):
    """`transformers.Swinv2Model` (or its state dict) -> our
    `models/swinv2.py` param tree. `cfg`: our SwinV2Config matching the HF
    config (img/patch/depths/heads/window)."""
    sd = _npify(hf.state_dict() if hasattr(hf, "state_dict") else hf)
    p = {
        "patch_embed": {
            # conv (E, C, P, P) -> our space-to-depth layout (P, P, C, E)
            "kernel": sd["embeddings.patch_embeddings.projection.weight"]
                      .transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
            "norm": {"scale": sd["embeddings.norm.weight"],
                     "bias": sd["embeddings.norm.bias"]},
        },
        "norm": {"scale": sd["layernorm.weight"], "bias": sd["layernorm.bias"]},
        "layers": [],
    }
    for s in range(cfg.num_layers):
        blocks = []
        for d in range(cfg.depths[s]):
            b = f"encoder.layers.{s}.blocks.{d}."
            a = b + "attention.self."
            qkv = np.concatenate([sd[a + "query.weight"].T,
                                  sd[a + "key.weight"].T,
                                  sd[a + "value.weight"].T], axis=1)
            blocks.append({
                "attn": {
                    "qkv": {"kernel": qkv},
                    "q_bias": sd[a + "query.bias"],
                    "v_bias": sd[a + "value.bias"],
                    "logit_scale": sd[a + "logit_scale"],
                    "cpb_fc1": {"kernel": sd[a + "continuous_position_bias_mlp.0.weight"].T,
                                "bias": sd[a + "continuous_position_bias_mlp.0.bias"]},
                    "cpb_fc2": {"kernel": sd[a + "continuous_position_bias_mlp.2.weight"].T},
                    "proj": {"kernel": sd[b + "attention.output.dense.weight"].T,
                             "bias": sd[b + "attention.output.dense.bias"]},
                },
                "norm1": {"scale": sd[b + "layernorm_before.weight"],
                          "bias": sd[b + "layernorm_before.bias"]},
                "mlp": {"fc1": {"kernel": sd[b + "intermediate.dense.weight"].T,
                                "bias": sd[b + "intermediate.dense.bias"]},
                        "fc2": {"kernel": sd[b + "output.dense.weight"].T,
                                "bias": sd[b + "output.dense.bias"]}},
                "norm2": {"scale": sd[b + "layernorm_after.weight"],
                          "bias": sd[b + "layernorm_after.bias"]},
            })
        stage = {"blocks": blocks}
        dkey = f"encoder.layers.{s}.downsample."
        if dkey + "reduction.weight" in sd:
            stage["downsample"] = {
                "reduction": {"kernel": sd[dkey + "reduction.weight"].T},
                "norm": {"scale": sd[dkey + "norm.weight"],
                         "bias": sd[dkey + "norm.bias"]},
            }
        p["layers"].append(stage)
    return jax.tree_util.tree_map(jnp.asarray, p)


def _clip_resblock(sd, pre):
    qkv_k = np.concatenate([sd[pre + "self_attn.q_proj.weight"].T,
                            sd[pre + "self_attn.k_proj.weight"].T,
                            sd[pre + "self_attn.v_proj.weight"].T], axis=1)
    qkv_b = np.concatenate([sd[pre + "self_attn.q_proj.bias"],
                            sd[pre + "self_attn.k_proj.bias"],
                            sd[pre + "self_attn.v_proj.bias"]])
    return {
        "ln_1": {"scale": sd[pre + "layer_norm1.weight"],
                 "bias": sd[pre + "layer_norm1.bias"]},
        "attn": {"in_proj": {"kernel": qkv_k, "bias": qkv_b},
                 "out_proj": {"kernel": sd[pre + "self_attn.out_proj.weight"].T,
                              "bias": sd[pre + "self_attn.out_proj.bias"]}},
        "ln_2": {"scale": sd[pre + "layer_norm2.weight"],
                 "bias": sd[pre + "layer_norm2.bias"]},
        "mlp": {"c_fc": {"kernel": sd[pre + "mlp.fc1.weight"].T,
                         "bias": sd[pre + "mlp.fc1.bias"]},
                "c_proj": {"kernel": sd[pre + "mlp.fc2.weight"].T,
                           "bias": sd[pre + "mlp.fc2.bias"]}},
    }


def clip_from_transformers(hf, cfg):
    """`transformers.CLIPModel` (or its state dict) -> (visual_params,
    text_params) for `models/clip.py`. `cfg`: our CLIPConfig matching the HF
    config."""
    sd = _npify(hf.state_dict() if hasattr(hf, "state_dict") else hf)
    vp = {
        "conv1": {"kernel": sd["vision_model.embeddings.patch_embedding.weight"]
                  .transpose(2, 3, 1, 0)},
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre": {"scale": sd["vision_model.pre_layrnorm.weight"],
                   "bias": sd["vision_model.pre_layrnorm.bias"]},
        "resblocks": [_clip_resblock(sd, f"vision_model.encoder.layers.{i}.")
                      for i in range(cfg.vision_layers)],
        "ln_post": {"scale": sd["vision_model.post_layernorm.weight"],
                    "bias": sd["vision_model.post_layernorm.bias"]},
        "proj": sd["visual_projection.weight"].T,
    }
    tp = {
        "token_embedding": sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "resblocks": [_clip_resblock(sd, f"text_model.encoder.layers.{i}.")
                      for i in range(cfg.text_layers)],
        "ln_final": {"scale": sd["text_model.final_layer_norm.weight"],
                     "bias": sd["text_model.final_layer_norm.bias"]},
        "text_projection": sd["text_projection.weight"].T,
        "logit_scale": np.float32(sd["logit_scale"]),
    }
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return to_jnp(vp), to_jnp(tp)


def pvt_v2_from_transformers(hf, depths):
    """`transformers.PvtV2Model` (or its state dict) -> our `models/pvt.py`
    param tree. HF splits the reference's fused `kv` projection
    (avs_s4/model/pvt.py:76-85) into separate key/value linears; the fused
    column order is [key | value] (both reshape (B,S,2,heads,hd) and take
    index 0 = key)."""
    sd = _npify(hf.state_dict() if hasattr(hf, "state_dict") else hf)

    def lin(pre):
        return {"kernel": sd[pre + ".weight"].T, "bias": sd[pre + ".bias"]}

    def ln(pre):
        return {"scale": sd[pre + ".weight"], "bias": sd[pre + ".bias"]}

    def conv(pre):
        return {"kernel": sd[pre + ".weight"].transpose(2, 3, 1, 0),
                "bias": sd[pre + ".bias"]}

    stages = []
    for s in range(len(depths)):
        lpre = f"encoder.layers.{s}"
        blocks = []
        for b in range(depths[s]):
            bpre = f"{lpre}.blocks.{b}"
            a = bpre + ".attention"
            p = {
                "norm1": ln(bpre + ".layer_norm_1"),
                "q": lin(a + ".query"),
                "kv": {"kernel": np.concatenate(
                           [sd[a + ".key.weight"].T,
                            sd[a + ".value.weight"].T], axis=1),
                       "bias": np.concatenate([sd[a + ".key.bias"],
                                               sd[a + ".value.bias"]])},
                "proj": lin(a + ".proj"),
                "norm2": ln(bpre + ".layer_norm_2"),
                "fc1": lin(bpre + ".mlp.dense1"),
                "dwconv": conv(bpre + ".mlp.dwconv.dwconv"),
                "fc2": lin(bpre + ".mlp.dense2"),
            }
            if a + ".spatial_reduction.weight" in sd:
                p["sr"] = conv(a + ".spatial_reduction")
                p["sr_norm"] = ln(a + ".layer_norm")
            blocks.append(p)
        stages.append({
            "patch_embed": {"proj": conv(lpre + ".patch_embedding.proj"),
                            "norm": ln(lpre + ".patch_embedding.layer_norm")},
            "blocks": blocks,
            "norm": ln(lpre + ".layer_norm"),
        })
    return jax.tree_util.tree_map(jnp.asarray, {"stages": stages})
