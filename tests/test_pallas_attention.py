"""Fused window-attention Pallas kernel vs the XLA einsum path (interpret
mode on CPU; the same kernel compiles on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.ops import windows as W
from dg_sct_tpu.ops.pallas import window_attention as PA


@pytest.mark.parametrize("nW,N,H,D,masked", [(4, 16, 2, 8, False),
                                             (4, 16, 2, 8, True),
                                             (16, 64, 4, 24, False)])
def test_fused_matches_einsum(nW, N, H, D, masked):
    B = 2  # images; Bw = B * nW windows in native layout
    rs = np.random.RandomState(0)
    q = rs.randn(B * nW, N, H, D).astype(np.float32) * 0.3
    k = rs.randn(B * nW, N, H, D).astype(np.float32) * 0.3
    v = rs.randn(B * nW, N, H, D).astype(np.float32) * 0.3
    bias = rs.randn(H, N, N).astype(np.float32) * 0.3
    mask = None
    if masked:
        mask = np.where(rs.rand(nW, N, N) > 0.7, -100.0, 0.0).astype(np.float32)

    out = np.asarray(PA.fused_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(mask) if mask is not None else None, nW=nW, interpret=True))

    scores = np.einsum("wnhd,wmhd->whnm", q, k) + bias[None]
    if mask is not None:
        full_mask = np.tile(mask, (B, 1, 1))
        scores = scores + full_mask[:, None]
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ref = np.einsum("whnm,wmhd->wnhd", attn, v)
    assert np.max(np.abs(out - ref)) < 1e-5


def test_attn_core_pallas_path_matches_xla():
    """End-to-end through window_attention_v1 with USE_PALLAS in interpret
    mode (monkeypatched to interpret=True for CPU)."""
    import functools
    ws, heads, C, nW = 4, 2, 16, 4
    N = ws * ws
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2 * nW, N, C).astype(np.float32) * 0.2)
    params = W.attention_v1_init(jax.random.PRNGKey(0), C, ws, heads)

    ref = np.asarray(W.window_attention_v1(params, x, num_heads=heads, ws=ws, nW=nW))

    orig = PA.fused_window_attention
    try:
        W.set_pallas(True)
        PA_interp = functools.partial(orig, interpret=True)
        import dg_sct_tpu.ops.pallas.window_attention as mod
        mod.fused_window_attention = PA_interp
        got = np.asarray(W.window_attention_v1(params, x, num_heads=heads, ws=ws, nW=nW))
    finally:
        W.set_pallas(False)
        import dg_sct_tpu.ops.pallas.window_attention as mod
        mod.fused_window_attention = orig
    assert np.max(np.abs(got - ref)) < 1e-5
