"""Attention-variant library — JAX rebuild of `DG-SCT/AVVP/nets/attentions.py`
(the reference vendors the public `sooftware/attentions` collection; zero live
call sites in the reference — kept for interface parity, SURVEY.md §2.7).

Eight variants, each an `init_*(key, ...) -> params` / pure `*_attention(params,
...) -> (context, attn)` pair over explicit pytrees. Formulated as batched
einsums so XLA tiles them onto the MXU; no data-dependent control flow.

Reference anchors (file:line refer to the torch original):
  * ScaledDotProductAttention  — attentions.py:10-39
  * DotProductAttention        — attentions.py:42-56
  * AdditiveAttention          — attentions.py:59-85
  * LocationAwareAttention     — attentions.py:88-141
  * MultiHeadLocationAware     — attentions.py:144-200
  * MultiHeadAttention         — attentions.py:203-271
  * RelativeMultiHeadAttention — attentions.py:274-358
  * CustomizingAttention       — attentions.py:361-427
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _linear(key, d_in, d_out, *, bias=True, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(d_in)
    kk, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kk, (d_in, d_out), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return p


def _apply(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def scaled_dot_product_attention(query, key, value, mask=None):
    """attentions.py:31-39 — softmax(QK^T / sqrt(d)) V."""
    d = query.shape[-1]
    score = jnp.einsum("bqd,bkd->bqk", query, key) / math.sqrt(d)
    if mask is not None:
        score = jnp.where(mask.reshape(score.shape), -jnp.inf, score)
    attn = jax.nn.softmax(score, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", attn, value), attn


def dot_product_attention(query, value):
    """attentions.py:49-56 — unscaled QV^T softmax over values."""
    score = jnp.einsum("bqd,bkd->bqk", query, value)
    attn = jax.nn.softmax(score, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", attn, value), attn


def init_additive(key, hidden_dim, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"query_proj": _linear(k1, hidden_dim, hidden_dim, bias=False, dtype=dtype),
            "key_proj": _linear(k2, hidden_dim, hidden_dim, bias=False, dtype=dtype),
            "score_proj": _linear(k3, hidden_dim, 1, dtype=dtype),
            "bias": jax.random.uniform(k4, (hidden_dim,), dtype, -0.1, 0.1)}


def additive_attention(params, query, key, value):
    """Bahdanau additive attention (attentions.py:81-85). `query` broadcasts
    against `key` exactly as the torch `+` does (q_len == k_len or 1)."""
    energy = jnp.tanh(_apply(params["key_proj"], key)
                      + _apply(params["query_proj"], query) + params["bias"])
    score = _apply(params["score_proj"], energy)[..., 0]
    attn = jax.nn.softmax(score, axis=-1)
    context = jnp.einsum("bk,bkd->bd", attn, value)[:, None, :]
    return context, attn


def _conv1d_same(x, w, b):
    """x: (B, L, Cin); w: (K, Cin, Cout) — 'same' padding, stride 1."""
    y = jax.lax.conv_general_dilated(x, w, (1,), "SAME",
                                     dimension_numbers=("NWC", "WIO", "NWC"))
    return y + b


def init_location_aware(key, hidden_dim, *, smoothing=True, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bound = 1.0 / math.sqrt(3 * 1)
    return {"conv_w": jax.random.uniform(k1, (3, 1, hidden_dim), dtype, -bound, bound),
            "conv_b": jax.random.uniform(k1, (hidden_dim,), dtype, -bound, bound),
            "query_proj": _linear(k2, hidden_dim, hidden_dim, bias=False, dtype=dtype),
            "value_proj": _linear(k3, hidden_dim, hidden_dim, bias=False, dtype=dtype),
            "score_proj": _linear(k4, hidden_dim, 1, dtype=dtype),
            "bias": jax.random.uniform(k5, (hidden_dim,), dtype, -0.1, 0.1),
            "smoothing": smoothing}


def location_aware_attention(params, query, value, last_attn=None):
    """attentions.py:118-141 — previous alignment fed through a conv."""
    B, L, D = value.shape
    if last_attn is None:
        last_attn = jnp.zeros((B, L), value.dtype)
    conv_attn = _conv1d_same(last_attn[:, :, None], params["conv_w"], params["conv_b"])
    energy = jnp.tanh(_apply(params["query_proj"], query)
                      + _apply(params["value_proj"], value)
                      + conv_attn + params["bias"])
    score = _apply(params["score_proj"], energy)[..., 0]
    if params["smoothing"]:
        score = jax.nn.sigmoid(score)
        attn = score / jnp.sum(score, axis=-1, keepdims=True)
    else:
        attn = jax.nn.softmax(score, axis=-1)
    context = jnp.einsum("bk,bkd->bd", attn, value)
    return context, attn


def init_multi_head_location_aware(key, hidden_dim, num_heads=8,
                                   conv_out_channel=10, dtype=jnp.float32):
    d = hidden_dim // num_heads
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    bound = 1.0 / math.sqrt(3 * num_heads)
    return {"conv_w": jax.random.uniform(k1, (3, num_heads, conv_out_channel),
                                         dtype, -bound, bound),
            "conv_b": jax.random.uniform(k1, (conv_out_channel,), dtype, -bound, bound),
            "loc_proj": _linear(k2, conv_out_channel, d, bias=False, dtype=dtype),
            "query_proj": _linear(k3, hidden_dim, d * num_heads, bias=False, dtype=dtype),
            "value_proj": _linear(k4, hidden_dim, d * num_heads, bias=False, dtype=dtype),
            "score_proj": _linear(k5, d, 1, dtype=dtype),
            "bias": jax.random.uniform(k6, (d,), dtype, -0.1, 0.1),
            "num_heads": num_heads}


def multi_head_location_aware_attention(params, query, value, last_attn=None):
    """attentions.py:177-200. query: (B, 1, D), value: (B, L, D)."""
    H = params["num_heads"]
    B, L, D = value.shape
    d = D // H
    if last_attn is None:
        last_attn = jnp.zeros((B, H, L), value.dtype)
    loc = _conv1d_same(jnp.swapaxes(last_attn, 1, 2), params["conv_w"],
                       params["conv_b"])                       # (B, L, C)
    loc_energy = jnp.tanh(_apply(params["loc_proj"], loc))     # (B, L, d)
    loc_energy = jnp.broadcast_to(loc_energy[:, None], (B, H, L, d))
    q = _apply(params["query_proj"], query).reshape(B, -1, H, d).transpose(0, 2, 1, 3)
    v = _apply(params["value_proj"], value).reshape(B, L, H, d).transpose(0, 2, 1, 3)
    energy = jnp.tanh(v + q + loc_energy + params["bias"])     # (B, H, L, d)
    score = _apply(params["score_proj"], energy)[..., 0]       # (B, H, L)
    attn = jax.nn.softmax(score, axis=-1)
    context = jnp.einsum("bhk,bhkd->bhd", attn, v).reshape(B, 1, H * d)
    return context, attn


def init_multi_head(key, d_model=512, num_heads=8, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"query_proj": _linear(k1, d_model, d_model, dtype=dtype),
            "key_proj": _linear(k2, d_model, d_model, dtype=dtype),
            "value_proj": _linear(k3, d_model, d_model, dtype=dtype),
            "num_heads": num_heads}


def multi_head_attention(params, query, key, value, mask=None):
    """attentions.py:246-271 — no output projection, concat-of-heads out."""
    H = params["num_heads"]
    B = value.shape[0]
    d = query.shape[-1] // H

    def split(p, x):
        return _apply(p, x).reshape(B, -1, H, d).transpose(0, 2, 1, 3)

    q, k, v = (split(params[n], x) for n, x in
               (("query_proj", query), ("key_proj", key), ("value_proj", value)))
    score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    if mask is not None:
        score = jnp.where(mask[:, None], -jnp.inf, score)
    attn = jax.nn.softmax(score, axis=-1)
    context = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    context = context.transpose(0, 2, 1, 3).reshape(B, -1, H * d)
    return context, attn


def init_relative_multi_head(key, d_model=512, num_heads=16, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    d = d_model // num_heads
    xav = math.sqrt(6.0 / (num_heads + d))
    return {"query_proj": _linear(ks[0], d_model, d_model, dtype=dtype),
            "key_proj": _linear(ks[1], d_model, d_model, dtype=dtype),
            "value_proj": _linear(ks[2], d_model, d_model, dtype=dtype),
            "pos_proj": _linear(ks[3], d_model, d_model, bias=False, dtype=dtype),
            "out_proj": _linear(ks[4], d_model, d_model, dtype=dtype),
            "u_bias": jax.random.uniform(ks[5], (num_heads, d), dtype, -xav, xav),
            "v_bias": jax.random.uniform(ks[6], (num_heads, d), dtype, -xav, xav),
            "num_heads": num_heads}


def _rel_shift(pos_score):
    """Transformer-XL relative shift (attentions.py:350-358): pad a zero
    column, fold, drop the first row — realigns Q·R to relative offsets."""
    B, H, L1, L2 = pos_score.shape
    padded = jnp.concatenate(
        [jnp.zeros((B, H, L1, 1), pos_score.dtype), pos_score], axis=-1)
    padded = padded.reshape(B, H, L2 + 1, L1)
    return padded[:, :, 1:].reshape(B, H, L1, L2)


def relative_multi_head_attention(params, query, key, value, pos_embedding,
                                  mask=None, *, train=False, rng=None,
                                  dropout_p=0.1):
    """attentions.py:317-348 — Transformer-XL content + position scoring."""
    H = params["num_heads"]
    B, L, D = value.shape
    d = D // H
    q = _apply(params["query_proj"], query).reshape(B, -1, H, d)
    k = _apply(params["key_proj"], key).reshape(B, -1, H, d).transpose(0, 2, 1, 3)
    v = _apply(params["value_proj"], value).reshape(B, -1, H, d).transpose(0, 2, 1, 3)
    pos = _apply(params["pos_proj"], pos_embedding).reshape(B, -1, H, d)

    content = jnp.einsum("bqhd,bhkd->bhqk", q + params["u_bias"], k)
    pos_score = jnp.einsum("bqhd,bkhd->bhqk", q + params["v_bias"], pos)
    score = (content + _rel_shift(pos_score)) / math.sqrt(D)
    if mask is not None:
        score = jnp.where(mask[:, None], -1e9, score)
    attn = jax.nn.softmax(score, axis=-1)
    if train and rng is not None and dropout_p > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, attn.shape)
        attn = attn * keep / (1.0 - dropout_p)
    context = jnp.einsum("bhqk,bhkd->bqhd", attn, v).reshape(B, -1, D)
    return _apply(params["out_proj"], context)


def init_customizing(key, hidden_dim, num_heads=4, conv_out_channel=10,
                     dtype=jnp.float32):
    d = hidden_dim // num_heads
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bound = 1.0 / math.sqrt(3 * 1)
    return {"conv_w": jax.random.uniform(k1, (3, 1, conv_out_channel), dtype,
                                         -bound, bound),
            "conv_b": jax.random.uniform(k1, (conv_out_channel,), dtype, -bound, bound),
            "query_proj": _linear(k2, hidden_dim, d * num_heads, dtype=dtype),
            "value_proj": _linear(k3, hidden_dim, d * num_heads, bias=False, dtype=dtype),
            "loc_proj": _linear(k4, conv_out_channel, d, bias=False, dtype=dtype),
            "bias": jax.random.uniform(k5, (d * num_heads,), dtype, -0.1, 0.1),
            "num_heads": num_heads}


def customizing_attention(params, query, value, last_attn=None):
    """attentions.py:396-418 — multi-head + location-aware hybrid.

    NOTE: the torch original calls `self.scaled_dot_attn(query, value)` with
    only two arguments, which crashes (value=None) if ever executed — dead
    code in the reference. This rebuild uses the evident intent
    `scaled_dot(query, value, value)`."""
    H = params["num_heads"]
    B, Lq = query.shape[0], query.shape[1]
    Lv, D = value.shape[1], value.shape[2]
    d = D // H
    if last_attn is None:
        last_attn = jnp.zeros((B * H, Lv), value.dtype)
    # loc energy (attentions.py:420-426)
    conv = _conv1d_same(last_attn[:, :, None], params["conv_w"], params["conv_b"])
    conv = conv.reshape(B, H, Lv, -1)
    loc_energy = _apply(params["loc_proj"], conv)              # (B, H, Lv, d)
    loc_energy = loc_energy.transpose(0, 2, 1, 3).reshape(B, Lv, H * d)

    q = _apply(params["query_proj"], query)
    v = _apply(params["value_proj"], value) + loc_energy + params["bias"]
    q = q.reshape(B, Lq, H, d).transpose(0, 2, 1, 3).reshape(B * H, Lq, d)
    v = v.reshape(B, Lv, H, d).transpose(0, 2, 1, 3).reshape(B * H, Lv, d)
    context, attn = scaled_dot_product_attention(q, v, v)
    context = context.reshape(B, H, Lq, d).transpose(0, 2, 1, 3).reshape(B, Lq, -1)
    return context, attn
