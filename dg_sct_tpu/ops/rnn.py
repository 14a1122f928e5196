"""LSTM with torch-compatible gate layout, via lax.scan.

The AVE temporal head (`RNNEncoder`, `DG-SCT/AVE/nets/net_trans.py:44-57`) and
the AVQA question encoder (`net_grd_avst/net_avst.py:238-261`) both use
`nn.LSTM`; weights port directly when gate order (i, f, g, o) and the dual
bias vectors are preserved.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .basic import kaiming_uniform


def lstm_cell_init(key, in_dim, hidden, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -bound, bound)
    return {"wi": u(k[0], (in_dim, 4 * hidden)), "wh": u(k[1], (hidden, 4 * hidden)),
            "bi": u(k[2], (4 * hidden,)), "bh": u(k[3], (4 * hidden,))}


def _lstm_scan(params, x, reverse=False):
    """x: (B, T, D) -> (B, T, H). Gate order i,f,g,o (torch)."""
    B, T, D = x.shape
    H = params["wh"].shape[0]
    # hoist the input projection out of the scan: one big MXU matmul
    xp = x @ params["wi"] + (params["bi"] + params["bh"])  # (B, T, 4H)
    xp = xp.transpose(1, 0, 2)  # (T, B, 4H)
    if reverse:
        xp = jnp.flip(xp, axis=0)

    def step(carry, inp):
        h, c = carry
        gates = inp + h @ params["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    _, hs = jax.lax.scan(step, (h0, h0), xp)
    if reverse:
        hs = jnp.flip(hs, axis=0)
    return hs.transpose(1, 0, 2)


def bilstm_init(key, in_dim, hidden, dtype=jnp.float32):
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_cell_init(kf, in_dim, hidden, dtype),
            "bwd": lstm_cell_init(kb, in_dim, hidden, dtype)}


def bilstm(params, x):
    """Bidirectional single-layer LSTM, batch_first. (B,T,D) -> (B,T,2H)."""
    return jnp.concatenate([
        _lstm_scan(params["fwd"], x),
        _lstm_scan(params["bwd"], x, reverse=True)], axis=-1)


def lstm(params, x):
    """Unidirectional single-layer LSTM, batch_first."""
    return _lstm_scan(params, x)


def lstm_with_state(params, x):
    """Unidirectional single-layer LSTM returning (outputs, (h_T, c_T)).
    Needed by the AVQA QstEncoder which consumes the final hidden AND cell
    states (net_avst.py:253-257)."""
    B, T, D = x.shape
    H = params["wh"].shape[0]
    xp = (x @ params["wi"] + (params["bi"] + params["bh"])).transpose(1, 0, 2)

    def step(carry, inp):
        h, c = carry
        gates = inp + h @ params["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    (hT, cT), hs = jax.lax.scan(step, (h0, h0), xp)
    return hs.transpose(1, 0, 2), (hT, cT)
