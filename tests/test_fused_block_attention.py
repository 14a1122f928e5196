"""Fused attention half-block kernel vs the XLA reference composition
(interpret mode on CPU; the TPU path compiles the same kernel)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.ops import windows as W
from dg_sct_tpu.ops.basic import layer_norm, layer_norm_init, linear_init


def _ref_v2(params, x, *, heads, res, ws, shift, pretrained_ws=0):
    H, Wd = res
    attn = W.shifted_window_attention(
        lambda w, m, nw: W.window_attention_v2(params["attn"], w, num_heads=heads,
                                               ws=ws, mask=m, nW=nw,
                                               pretrained_ws=pretrained_ws),
        x, H=H, W=Wd, ws=ws, shift=shift)
    return x + layer_norm(params["norm1"], attn)


def _ref_v1(params, x, *, heads, res, ws, shift):
    H, Wd = res
    xn = layer_norm(params["norm1"], x)
    attn = W.shifted_window_attention(
        lambda w, m, nw: W.window_attention_v1(params["attn"], w, num_heads=heads,
                                               ws=ws, mask=m, nW=nw),
        xn, H=H, W=Wd, ws=ws, shift=shift)
    return x + attn


@pytest.mark.parametrize("kind,shift", [("v1", 0), ("v1", 2), ("v2", 0), ("v2", 2)])
def test_fused_half_block_matches_xla(kind, shift):
    rs = np.random.RandomState(0)
    B, H, Wd, C, heads, ws = 2, 8, 8, 32, 4, 4
    key = jax.random.PRNGKey(0)
    if kind == "v1":
        attn_p = W.attention_v1_init(key, C, ws, heads)
    else:
        attn_p = W.attention_v2_init(key, C, heads)
    params = {"attn": attn_p, "norm1": layer_norm_init(C)}
    # non-trivial norm params
    params["norm1"]["scale"] = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
    params["norm1"]["bias"] = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))

    x = jnp.asarray(rs.randn(B, H * Wd, C).astype(np.float32))
    ref_fn = _ref_v1 if kind == "v1" else _ref_v2
    ref = np.asarray(ref_fn(params, x, heads=heads, res=(H, Wd), ws=ws,
                            shift=shift))
    out = np.asarray(W.fused_half_block(params, x, kind=kind, heads=heads,
                                        res=(H, Wd), ws=ws, shift=shift,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_fused_half_block_multi_strip_rect():
    """Rectangular map with several row strips + V2 shift (mask slicing per
    strip is the tricky part)."""
    rs = np.random.RandomState(1)
    B, H, Wd, C, heads, ws, shift = 1, 12, 8, 16, 2, 4, 2
    key = jax.random.PRNGKey(1)
    params = {"attn": W.attention_v2_init(key, C, heads),
              "norm1": layer_norm_init(C)}
    x = jnp.asarray(rs.randn(B, H * Wd, C).astype(np.float32))
    ref = np.asarray(_ref_v2(params, x, heads=heads, res=(H, Wd), ws=ws,
                             shift=shift))
    out = np.asarray(W.fused_half_block(params, x, kind="v2", heads=heads,
                                        res=(H, Wd), ws=ws, shift=shift,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
