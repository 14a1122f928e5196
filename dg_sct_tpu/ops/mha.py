"""Multi-head attention with torch `nn.MultiheadAttention` weight layout.

Used by the temporal-relation encoder/decoder library
(`DG-SCT/AVE/nets/models.py:74-157`) and the CMBS `AudioVideoInter`
(`net_trans.py:165-179`). Inputs are time-major (T, B, E) to match the
reference call sites; internally we compute batch-major.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .basic import dropout, linear, linear_init


def mha_init(key, embed_dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(embed_dim)
    # torch uses xavier_uniform_ for in_proj; bound = sqrt(6/(E+3E))... keep
    # simple uniform here — exactness only matters for ported weights.
    return {
        "in_proj": {"kernel": jax.random.uniform(k1, (embed_dim, 3 * embed_dim), dtype, -bound, bound),
                    "bias": jnp.zeros((3 * embed_dim,), dtype)},
        "out_proj": linear_init(k2, embed_dim, embed_dim, dtype=dtype),
    }


def mha(params, query, key, value, *, num_heads, rng=None, dropout_rate=0.0,
        train=False):
    """query/key/value: (Tq/Tk/Tk, B, E) time-major. Returns (Tq, B, E)."""
    Tq, B, E = query.shape
    Tk = key.shape[0]
    hd = E // num_heads
    wq, wk, wv = jnp.split(params["in_proj"]["kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(params["in_proj"]["bias"], 3)
    q = (query @ wq + bq).transpose(1, 0, 2).reshape(B, Tq, num_heads, hd)
    k = (key @ wk + bk).transpose(1, 0, 2).reshape(B, Tk, num_heads, hd)
    v = (value @ wv + bv).transpose(1, 0, 2).reshape(B, Tk, num_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(query.dtype)
    if train and dropout_rate > 0.0 and rng is not None:
        attn = dropout(rng, attn, dropout_rate, train)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Tq, E)
    out = linear(params["out_proj"], out)
    return out.transpose(1, 0, 2)
