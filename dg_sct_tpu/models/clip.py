"""CLIP (ViT-B/32) visual + text towers.

Rebuild of the vendored OpenAI CLIP (`pretrain/nets/clip/model.py`) with the
visual tower exposed as externally-drivable block halves, since the pretrain
interleave (`pretrain/nets/net_trans.py:818-908`) pairs each ViT block with an
HTS-AT block and injects adapters between the attention and MLP halves.

Semantics: pre-norm residual blocks, QuickGELU, causal text mask, class token
+ learned positional embeddings, `ln_post` + projection on the class token.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import CLIPConfig
from ..ops.basic import layer_norm, layer_norm_init, linear, linear_init, patch_embed
from ..ops.mha import mha_init


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_resblock(key, d_model, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln_1": layer_norm_init(d_model, dtype),
        "attn": mha_init(k1, d_model, dtype),
        "ln_2": layer_norm_init(d_model, dtype),
        "mlp": {"c_fc": linear_init(k2, d_model, 4 * d_model, dtype=dtype),
                "c_proj": linear_init(k3, 4 * d_model, d_model, dtype=dtype)},
    }


def _self_attention(params, x, *, num_heads, mask=None):
    """Batch-major self-attention with torch MHA weight layout.
    x: (B, L, D)."""
    B, L, D = x.shape
    hd = D // num_heads
    wq, wk, wv = jnp.split(params["in_proj"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(params["in_proj"]["bias"], 3)
    q = (x @ wq + bq).reshape(B, L, num_heads, hd)
    k = (x @ wk + bk).reshape(B, L, num_heads, hd)
    v = (x @ wv + bv).reshape(B, L, num_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k,
                      preferred_element_type=jnp.float32)
    if mask is not None:
        attn = attn + mask[None, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, D)
    return linear(params["out_proj"], out)


def attention_part(params, x, *, num_heads, mask=None):
    """ln_1 -> attention (the `resblocks[i].attention(ln_1(x))` half)."""
    return _self_attention(params["attn"], layer_norm(params["ln_1"], x),
                           num_heads=num_heads, mask=mask)


def mlp_part(params, x):
    """ln_2 -> MLP (QuickGELU) half."""
    h = layer_norm(params["ln_2"], x)
    return linear(params["mlp"]["c_proj"], quick_gelu(linear(params["mlp"]["c_fc"], h)))


def resblock(params, x, *, num_heads, mask=None):
    x = x + attention_part(params, x, num_heads=num_heads, mask=mask)
    return x + mlp_part(params, x)


# ---------------------------------------------------------------------------
# visual tower
# ---------------------------------------------------------------------------

def init_visual(key, cfg: CLIPConfig, dtype=jnp.float32):
    k = jax.random.split(key, cfg.vision_layers + 4)
    grid = cfg.image_size // cfg.vision_patch
    width = cfg.vision_width
    return {
        "conv1": {"kernel": jax.random.normal(
            k[0], (cfg.vision_patch, cfg.vision_patch, 3, width), dtype) * 0.02},
        "class_embedding": jax.random.normal(k[1], (width,), dtype) * width ** -0.5,
        "positional_embedding": jax.random.normal(
            k[2], (grid * grid + 1, width), dtype) * width ** -0.5,
        "ln_pre": layer_norm_init(width, dtype),
        "resblocks": [init_resblock(k[3 + i], width, dtype)
                      for i in range(cfg.vision_layers)],
        "ln_post": layer_norm_init(width, dtype),
        "proj": jax.random.normal(k[-1], (width, cfg.embed_dim), dtype) * width ** -0.5,
    }


def visual_embed(params, images, cfg: CLIPConfig):
    """(N, H, W, 3) -> (N, grid^2+1, width) tokens after ln_pre."""
    p = cfg.vision_patch
    N, H, W, _ = images.shape
    gh, gw = H // p, W // p
    x = images.reshape(N, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(N, gh * gw, p * p * 3) @ params["conv1"]["kernel"].reshape(p * p * 3, -1)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (N, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"]
    return layer_norm(params["ln_pre"], x)


def visual_project(params, x):
    """ln_post on the class token + projection -> (N, embed_dim)."""
    return layer_norm(params["ln_post"], x[:, 0]) @ params["proj"]


def visual_forward(params, images, cfg: CLIPConfig):
    x = visual_embed(params, images, cfg)
    for bp in params["resblocks"]:
        x = resblock(bp, x, num_heads=cfg.vision_heads)
    return visual_project(params, x)


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def init_text(key, cfg: CLIPConfig, dtype=jnp.float32):
    k = jax.random.split(key, cfg.text_layers + 4)
    w = cfg.text_width
    return {
        "token_embedding": jax.random.normal(k[0], (cfg.vocab_size, w), dtype) * 0.02,
        "positional_embedding": jax.random.normal(k[1], (cfg.context_length, w), dtype) * 0.01,
        "resblocks": [init_resblock(k[2 + i], w, dtype) for i in range(cfg.text_layers)],
        "ln_final": layer_norm_init(w, dtype),
        "text_projection": jax.random.normal(k[-1], (w, cfg.embed_dim), dtype) * w ** -0.5,
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), dtype),
    }


def causal_mask(L, dtype=jnp.float32):
    return jnp.triu(jnp.full((L, L), -jnp.inf, dtype), k=1)


def encode_text_embeddings(params, prompt_embeds, tokenized, cfg: CLIPConfig):
    """Text tower over PRE-BUILT prompt embeddings (n, 77, width) — the
    PromptLearner path (`TextEncoder.forward`, prompt_learner.py:106-128).
    `tokenized` (n, 77) int ids locate the EOT position (argmax)."""
    x = prompt_embeds + params["positional_embedding"]
    mask = causal_mask(x.shape[1], x.dtype)
    for bp in params["resblocks"]:
        x = resblock(bp, x, num_heads=cfg.text_heads, mask=mask)
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokenized, axis=-1)
    feats = x[jnp.arange(x.shape[0]), eot]
    return feats @ params["text_projection"]


def encode_text(params, tokenized, cfg: CLIPConfig):
    emb = params["token_embedding"][tokenized]
    return encode_text_embeddings(params, emb, tokenized, cfg)
