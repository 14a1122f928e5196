"""GroupViT-style token grouping library for AVVP.

Rebuild of `DG-SCT/AVVP/nets/grouping.py:70-770`: `AssignAttention`
(soft/hard/gumbel with straight-through), `GroupingBlock`, `CrossAttnBlock`,
`AttnBlock`, and `ModalityTrans` (self-attn over [tokens ; group tokens] ->
optional HAN cross-modal encoder -> grouping assignment down to 25 groups).

Everything is (B, N, C) batch-major dense matmuls; assignment modes are
static config so each variant traces to a fixed XLA graph.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import (dropout, layer_norm, layer_norm_init, linear,
                         linear_init, mlp, mlp_init, trunc_normal)


# ---------------------------------------------------------------------------
# attention primitives
# ---------------------------------------------------------------------------

def attention_init(key, dim, out_dim=None, qkv_bias=False, dtype=jnp.float32):
    out_dim = out_dim or dim
    k = jax.random.split(key, 4)
    return {"q_proj": linear_init(k[0], dim, dim, bias=qkv_bias, dtype=dtype),
            "k_proj": linear_init(k[1], dim, dim, bias=qkv_bias, dtype=dtype),
            "v_proj": linear_init(k[2], dim, dim, bias=qkv_bias, dtype=dtype),
            "proj": linear_init(k[3], dim, out_dim, dtype=dtype)}


def attention(params, query, key=None, value=None, *, num_heads):
    """(B, N, C) x (B, S, C) -> (B, N, C) standard softmax cross-attention."""
    key = query if key is None else key
    value = key if value is None else value
    B, N, C = query.shape
    hd = C // num_heads
    q = linear(params["q_proj"], query).reshape(B, N, num_heads, hd)
    k = linear(params["k_proj"], key).reshape(B, -1, num_heads, hd)
    v = linear(params["v_proj"], value).reshape(B, -1, num_heads, hd)
    attn = jnp.einsum("bnhd,bshd->bhns", q * hd ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(query.dtype)
    out = jnp.einsum("bhns,bshd->bnhd", attn, v).reshape(B, N, C)
    return linear(params["proj"], out)


def hard_softmax(logits, axis):
    """Straight-through argmax: one-hot forward, softmax gradient."""
    y_soft = jax.nn.softmax(logits, axis=axis)
    idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, axis % logits.ndim)
              == idx).astype(logits.dtype)
    return onehot - jax.lax.stop_gradient(y_soft) + y_soft


def gumbel_softmax(rng, logits, tau=1.0, hard=False, axis=-1):
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, axis % logits.ndim)
                  == idx).astype(logits.dtype)
        return onehot - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


def assign_attention_init(key, dim, dtype=jnp.float32):
    return attention_init(key, dim, qkv_bias=True, dtype=dtype)


def assign_attention(params, query, key_, *, hard, gumbel, train=False,
                     rng=None, gumbel_tau=1.0, assign_eps=1.0,
                     return_attn=False):
    """Single-head assignment attention (grouping.py:70-155): softmax over the
    GROUP axis (-2), then row-normalize over tokens. query: (B, S2, C) groups,
    key_: (B, S, C) tokens. Returns (out, attn_dict)."""
    B, S2, C = query.shape
    q = linear(params["q_proj"], query)
    k = linear(params["k_proj"], key_)
    v = linear(params["v_proj"], key_)  # value defaults to the key tensor
    raw = jnp.einsum("bnc,bsc->bns", q, k) * (C ** -0.5)

    def get_attn(raw, use_gumbel, use_hard):
        if use_gumbel and train and rng is not None:
            return gumbel_softmax(rng, raw, tau=gumbel_tau, hard=use_hard, axis=-2)
        if use_hard:
            return hard_softmax(raw, axis=-2)
        return jax.nn.softmax(raw, axis=-2)

    attn = get_attn(raw, gumbel, hard)
    attn_dict = None
    if return_attn:
        soft = jax.nn.softmax(raw, axis=-2)
        soft = 1.0 + jax.nn.softmax(soft, axis=-1)
        attn_dict = {"hard": attn, "soft": soft}
    attn = attn / (jnp.sum(attn, axis=-1, keepdims=True) + assign_eps)
    out = jnp.einsum("bns,bsc->bnc", attn, v)
    return linear(params["proj"], out), attn_dict


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def attn_block_init(key, dim, mlp_ratio=4.0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"norm1": layer_norm_init(dim, dtype),
            "qkv": linear_init(k1, dim, dim * 3, bias=True, dtype=dtype),
            "proj": linear_init(k2, dim, dim, dtype=dtype),
            "norm2": layer_norm_init(dim, dtype),
            "mlp": mlp_init(k3, dim, int(dim * mlp_ratio), dtype=dtype)}


def attn_block(params, x, *, num_heads):
    """Pre-norm self-attention block with fused qkv (grouping.py AttnBlock)."""
    B, N, C = x.shape
    hd = C // num_heads
    xn = layer_norm(params["norm1"], x)
    qkv = linear(params["qkv"], xn).reshape(B, N, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bshd->bhns", q * hd ** -0.5, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhns,bshd->bnhd", attn, v).reshape(B, N, C)
    x = x + linear(params["proj"], out)
    return x + mlp(params["mlp"], layer_norm(params["norm2"], x))


def cross_attn_block_init(key, dim, mlp_ratio=4.0, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"attn": attention_init(k1, dim, qkv_bias=True, dtype=dtype),
            "norm2": layer_norm_init(dim, dtype),
            "mlp": mlp_init(k2, dim, int(dim * mlp_ratio), dtype=dtype),
            "norm_post": layer_norm_init(dim, dtype)}


def cross_attn_block(params, query, key_, *, num_heads):
    """post_norm=True variant used by GroupingBlock.pre_assign_attn."""
    x = query + attention(params["attn"], query, key_, num_heads=num_heads)
    x = x + mlp(params["mlp"], layer_norm(params["norm2"], x))
    return layer_norm(params["norm_post"], x)


def grouping_block_init(key, dim, out_dim, num_group_token, num_output_group,
                        mlp_ratio=(0.5, 4.0), dtype=jnp.float32):
    k = jax.random.split(key, 4)
    tokens_dim = int(mlp_ratio[0] * dim)
    channels_dim = int(mlp_ratio[1] * dim)
    p = {
        "norm_tokens": layer_norm_init(dim, dtype),
        "mlp_inter": mlp_init(k[0], num_group_token, tokens_dim,
                              out=num_output_group, dtype=dtype),
        "norm_post_tokens": layer_norm_init(dim, dtype),
        "norm_x": layer_norm_init(dim, dtype),
        "pre_assign_attn": cross_attn_block_init(k[1], dim, dtype=dtype),
        "assign": assign_attention_init(k[2], dim, dtype),
        "norm_new_x": layer_norm_init(dim, dtype),
        "mlp_channels": mlp_init(k[3], dim, channels_dim, out=out_dim, dtype=dtype),
    }
    return p


def grouping_block(params, x, group_tokens, *, num_heads, hard, gumbel,
                   train=False, rng=None, return_attn=False):
    """(tokens (B,L,C), group_tokens (B,S1,C)) -> (groups (B,S2,C), attn_dict)."""
    group_tokens = layer_norm(params["norm_tokens"], group_tokens)
    x = layer_norm(params["norm_x"], x)
    # project S1 -> S2 group tokens via an MLP over the token axis
    proj = mlp(params["mlp_inter"], group_tokens.transpose(0, 2, 1)).transpose(0, 2, 1)
    proj = layer_norm(params["norm_post_tokens"], proj)
    proj = cross_attn_block(params["pre_assign_attn"], proj, x, num_heads=num_heads)
    new_x, attn_dict = assign_attention(params["assign"], proj, x, hard=hard,
                                        gumbel=gumbel, train=train, rng=rng,
                                        return_attn=return_attn)
    new_x = new_x + proj
    new_x = new_x + mlp(params["mlp_channels"], layer_norm(params["norm_new_x"], new_x))
    return new_x, attn_dict


def modality_trans_init(key, dim, *, depth, num_group_tokens=25,
                        num_output_groups=25, use_han=False, han_tokens=10,
                        mlp_ratio=4.0, dtype=jnp.float32):
    """`han_tokens` is the sequence length of the cross-modal HAN input — 10
    frames in the reference (mgn.py builds GroupingBlock_Han with
    num_group_token=10)."""
    k = jax.random.split(key, depth + 2)
    p = {"blocks": [attn_block_init(k[i], dim, mlp_ratio, dtype) for i in range(depth)],
         "grouping": grouping_block_init(k[depth], dim, dim, num_group_tokens,
                                         num_output_groups, dtype=dtype)}
    if use_han:
        p["han_encoder"] = grouping_block_init(k[depth + 1], dim, dim, han_tokens,
                                               han_tokens, dtype=dtype)
    return p


def modality_trans(params, x, group_token, *, num_heads=8, x_other=None,
                   hard=False, gumbel=False, train=False, rng=None,
                   return_attn=False):
    """ModalityTrans forward (grouping.py:746-770). group_token: (S1, C) or
    (B, S1, C). Returns (groups, attn_dict, x_attn)."""
    B = x.shape[0]
    if group_token.ndim == 2:
        group_token = jnp.broadcast_to(group_token[None], (B,) + group_token.shape)
    S1 = group_token.shape[1]
    cat = jnp.concatenate([x, group_token], axis=1)
    for bp in params["blocks"]:
        cat = attn_block(bp, cat, num_heads=num_heads)
    x_attn, group_token = cat[:, :-S1], cat[:, -S1:]

    if "han_encoder" in params and x_other is not None:
        # HAN uses the inverted assignment mode (mgn builds it with
        # hard=not hard_assignment, gumbel=not hard_assignment)
        x_attn, _ = grouping_block(params["han_encoder"], x_attn, x_other,
                                   num_heads=8, hard=not hard, gumbel=not hard,
                                   train=train, rng=rng)
    out, attn_dict = grouping_block(params["grouping"], x_attn, group_token,
                                    num_heads=num_heads, hard=hard, gumbel=gumbel,
                                    train=train, rng=rng, return_attn=return_attn)
    return out, attn_dict, x_attn
