"""Fused adapter stage-5 bottleneck kernel vs the unfused ops.basic path
(Pallas interpret mode on the CPU mesh; the TPU path compiles the same
kernel).  Stage-5 semantics: net_trans.py:626-671 after eval BN/gate folding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dg_sct_tpu.configs import AdapterConfig
from dg_sct_tpu.models import adapter as A
from dg_sct_tpu.ops.basic import (grouped_linear, grouped_linear_init,
                                  layer_norm, layer_norm_init)


def _stage5_ref(p, x, has_ln1):
    z = layer_norm(p["ln_before"], x) if has_ln1 else x
    h = jax.nn.relu(grouped_linear(p["down"], z))
    o = grouped_linear(p["up"], h)
    return layer_norm(p["ln_post"], o)


def _mk_params(key, C, g, r=8, bias=True, has_ln1=True, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    D = C // r
    p = {"down": grouped_linear_init(ks[0], C, D, g, bias=bias, dtype=dtype),
         "up": grouped_linear_init(ks[1], D, C, g, bias=bias, dtype=dtype),
         "ln_post": {"scale": 1.0 + 0.1 * jax.random.normal(ks[2], (C,), dtype),
                     "bias": 0.1 * jax.random.normal(ks[3], (C,), dtype)}}
    if has_ln1:
        p["ln_before"] = {"scale": 1.0 + 0.1 * jax.random.normal(ks[4], (C,), dtype),
                          "bias": 0.1 * jax.random.normal(ks[5], (C,), dtype)}
    return p


@pytest.mark.parametrize("C,g,has_ln1,bias", [
    (96, 2, True, True),     # HTS-AT stage-0 geometry
    (192, 2, True, True),    # Swin stage-0
    (192, 4, False, False),  # AVVP-style: 4 groups, no ln_before, no BN fold
])
def test_fused_bottleneck_matches_reference(C, g, has_ln1, bias):
    from dg_sct_tpu.ops.pallas.adapter_bottleneck import fused_bottleneck

    key = jax.random.PRNGKey(C + g)
    p = _mk_params(key, C, g, bias=bias, has_ln1=has_ln1)
    # rows NOT a multiple of the row tile -> exercises the pad/slice path
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 100, C), jnp.float32)
    ref = _stage5_ref(p, x, has_ln1)
    got = fused_bottleneck(p, x, has_ln1=has_ln1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_adapter_flag_parity():
    """Full adapter() with the fused flag on == off, after eval folding."""
    cfg = AdapterConfig()
    key = jax.random.PRNGKey(0)
    params, state = A.init_adapter(key, dim=96, other_dim=64,
                                   num_tokens_self=64, num_tokens_other=49,
                                   cfg=cfg)
    # make BN stats non-trivial before folding
    state = jax.tree_util.tree_map(
        lambda v: v + 0.05 if v.ndim == 1 else v, state)
    params = dict(params, gate=jnp.ones((1,)) * 0.7,
                  gate_av=jnp.ones((1,)) * 0.3)
    fp, fs = A.fold_eval(params, state, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96), jnp.float32)
    other = jax.random.normal(jax.random.PRNGKey(2), (2, 49, 64), jnp.float32)

    ref, ref_maps, _ = A.adapter(fp, fs, x, other, cfg, train=False)
    A.set_fused_bottleneck(True)
    try:
        got, got_maps, _ = A.adapter(fp, fs, x, other, cfg, train=False)
    finally:
        A.set_fused_bottleneck(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_maps), np.asarray(ref_maps),
                               rtol=1e-6, atol=1e-6)


def test_fused_bottleneck_skipped_when_unfoldable():
    """Unfolded BN / AVS epilogue must fall back to the unfused path (the
    fused kernel requires the post-fold serving shape)."""
    cfg = AdapterConfig()  # use_bn on, NOT folded
    params, state = A.init_adapter(jax.random.PRNGKey(3), dim=96,
                                   other_dim=64, num_tokens_self=64,
                                   num_tokens_other=49, cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 96), jnp.float32)
    other = jax.random.normal(jax.random.PRNGKey(5), (1, 49, 64), jnp.float32)
    ref, _, _ = A.adapter(params, state, x, other, cfg, train=False)
    A.set_fused_bottleneck(True)
    try:
        got, _, _ = A.adapter(params, state, x, other, cfg, train=False)
    finally:
        A.set_fused_bottleneck(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
