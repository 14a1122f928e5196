"""Parameterized-hypercomplex-multiplication (PHM / compacter) layers.

JAX rebuild of `few-shot/nets/my_layers.py:38-178` + `kronecker.py` (the
reference vendors bayer-science-for-a-better-life/phc-gnn; zero live call
sites — the few-shot adapters use the standard bottleneck path — kept for
interface parity, SURVEY.md §2.7).

y = x @ H + b with H = sum_i phm_rule[i] ⊗ W[i]; optional rank-factorized W
and phm_rule. Here the kron-sum-matmul is contracted directly as one einsum:
    y[b, j*q + l] = sum_{i,k,p} rule[i,j,k] W[i,p,l] x[b, k*p_in + p]
— no materialized (in, out) H, so XLA sees a single MXU-friendly contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kronecker_product(a, b):
    """Batched Kronecker product (kronecker.py:6-19). a: (..., M, N),
    b: (..., P, Q) -> (..., M*P, N*Q)."""
    M, N = a.shape[-2:]
    P, Q = b.shape[-2:]
    res = a[..., :, None, :, None] * b[..., None, :, None, :]
    return res.reshape(*a.shape[:-2], M * P, N * Q)


def kronecker_product_einsum_batched(A, B):
    """(b, a, c) x (b, k, p) -> (b, a*k, c*p) (kronecker.py:22-33)."""
    b, a, c = A.shape
    _, k, p = B.shape
    return jnp.einsum("bac,bkp->bakcp", A, B).reshape(b, a * k, c * p)


def init_phm_linear(key, in_features, out_features, phm_dim, *,
                    factorized_phm=False, factorized_phm_rule=False,
                    phm_rank=1, w_init="phm", phm_init_range=1e-4,
                    bias=True, dtype=jnp.float32):
    """my_layers.py:38-151. `w_init='phm'` follows the reference default
    (normal with std=phm_init_range); glorot variants supported."""
    assert in_features % phm_dim == 0 and out_features % phm_dim == 0
    d_in = in_features // phm_dim
    d_out = out_features // phm_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def w_draw(k, shape):
        fan_in, fan_out = shape[-2], shape[-1]
        if w_init == "glorot-normal":
            return jax.random.normal(k, shape, dtype) * jnp.sqrt(2.0 / (fan_in + fan_out))
        if w_init == "glorot-uniform":
            lim = jnp.sqrt(6.0 / (fan_in + fan_out))
            return jax.random.uniform(k, shape, dtype, -lim, lim)
        return jax.random.normal(k, shape, dtype) * phm_init_range

    p = {}
    if factorized_phm:
        p["W_left"] = w_draw(k1, (phm_dim, d_in, phm_rank))
        p["W_right"] = w_draw(k2, (phm_dim, phm_rank, d_out))
    else:
        p["W"] = w_draw(k1, (phm_dim, d_in, d_out))
    if factorized_phm_rule:
        p["phm_rule_left"] = jax.random.normal(k3, (phm_dim, phm_dim, 1), dtype) * 0.01
        p["phm_rule_right"] = jax.random.normal(k4, (phm_dim, 1, phm_dim), dtype) * 0.01
    else:
        p["phm_rule"] = jax.random.normal(k3, (phm_dim, phm_dim, phm_dim), dtype) * 0.01
    if bias:
        p["b"] = jnp.zeros((out_features,), dtype)
    return p


def phm_linear(params, x):
    """my_layers.py:169-180 / matvec_product:11-35. x: (..., phm_dim * d_in)."""
    if "W_left" in params:
        W = jnp.einsum("ipr,irl->ipl", params["W_left"], params["W_right"])
    else:
        W = params["W"]
    if "phm_rule_left" in params:
        rule = jnp.einsum("ijr,irk->ijk", params["phm_rule_left"],
                          params["phm_rule_right"])
    else:
        rule = params["phm_rule"]
    phm_dim, d_in, d_out = W.shape
    xs = x.reshape(*x.shape[:-1], phm_dim, d_in)
    # H[a*d_in+p, b*d_out+l] = sum_i rule[i,a,b] W[i,p,l]; y = x @ H
    y = jnp.einsum("...ap,iab,ipl->...bl", xs, rule, W)
    y = y.reshape(*x.shape[:-1], phm_dim * d_out)
    if "b" in params:
        y = y + params["b"]
    return y
