"""Fully-fused window-attention half-block Pallas kernel.

The XLA path materializes, per transformer block and per frame: the qkv
tensor, two window-partition relayout copies, the (nW, H, N, N) score and
softmax tensors, the attention output, and the projection input — ~20 MB of
HBM traffic per 192-d frame against an 0.9 MB activation. At bf16 batch sizes
the whole forward runs at ~84% HBM utilization, so these bytes ARE the step
time (measured: 126 GB/step at B=8).

This kernel performs the ENTIRE attention half-block in one VMEM-resident
pass over row-strips of windows:

    grid (B, H/ws); block x = (1, ws, W, C)       # one strip of W/ws windows
    in-kernel:  [pre-LN (V1)] -> qkv = x @ Wqkv + b -> per-window, per-head
                scores (+bias, +mask) -> softmax -> @v -> merge -> @Wproj
                -> [post-LN (V2)] -> out = x + attn      # fused residual

so HBM sees exactly: x read once, out written once, weights streamed.

Two modes mirror the two towers:
  * kind="v1" (HTS-AT, htsat.py:219-249): pre-norm, plain dot-product scores
    with additive rel-pos bias; returns x + proj(attn(LN1(x))).
  * kind="v2" (Swin-V2 / timm 0.6.12): NO pre-norm, scaled-cosine scores
    (L2-normalized q/k x clamped per-head logit scale), log-CPB bias
    (precomputed outside as 16*sigmoid(MLP) -> (H, N, N)); returns
    x + LN1(proj(attn(x))) — the post-norm residual the interleave drives
    (net_trans.py:894).

Shifted windows: the caller pre-rolls x (one cheap copy) and passes the
standard additive mask (nW, N, N); each grid row-strip sees its own mask
slice via the BlockSpec index map.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm_f32(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            ln_scale_ref, ln_bias_ref, mask_ref, logit_scale_ref, o_ref, *,
            kind, heads, ws, W, has_mask):
    C = x_ref.shape[-1]
    D = C // heads
    nW = W // ws
    N = ws * ws
    T = ws * W

    x = x_ref[0].reshape(T, C)                       # (ws, W, C) -> (T, C)
    xf = x.astype(jnp.float32)
    if kind == "v1":
        h_in = _layer_norm_f32(xf, ln_scale_ref[...].astype(jnp.float32),
                               ln_bias_ref[...].astype(jnp.float32))
    else:
        h_in = xf

    qkv = jax.lax.dot(h_in.astype(x.dtype), wqkv_ref[...],
                      preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[...].astype(jnp.float32)    # (T, 3C)
    qkv = qkv.reshape(ws, W, 3 * C)

    if kind == "v2":
        lscale = jnp.exp(jnp.minimum(logit_scale_ref[...].astype(jnp.float32),
                                     jnp.log(100.0)))  # (heads,)

    outs = []
    for w in range(nW):
        win = qkv[:, w * ws:(w + 1) * ws, :].reshape(N, 3 * C)
        per_head = []
        for h in range(heads):
            q = win[:, h * D:(h + 1) * D]
            k = win[:, C + h * D:C + (h + 1) * D]
            v = win[:, 2 * C + h * D:2 * C + (h + 1) * D]
            if kind == "v2":
                q = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True) + 1e-12)
                k = k * jax.lax.rsqrt(jnp.sum(k * k, -1, keepdims=True) + 1e-12)
                q = q * lscale[h]
            else:
                q = q * (D ** -0.5)
            s = jax.lax.dot(q, k.T, preferred_element_type=jnp.float32)
            s = s + bias_ref[h].astype(jnp.float32)
            if has_mask:
                s = s + mask_ref[w].astype(jnp.float32)
            s = s - jnp.max(s, -1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, -1, keepdims=True)
            per_head.append(jax.lax.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(per_head, axis=-1))  # (N, C)

    attn = jnp.stack(outs, axis=0)                       # (nW, N, C)
    attn = attn.reshape(nW, ws, ws, C).transpose(1, 0, 2, 3).reshape(T, C)
    proj = jax.lax.dot(attn.astype(x.dtype), wproj_ref[...],
                       preferred_element_type=jnp.float32)
    proj = proj + bproj_ref[...].astype(jnp.float32)
    if kind == "v2":
        proj = _layer_norm_f32(proj, ln_scale_ref[...].astype(jnp.float32),
                               ln_bias_ref[...].astype(jnp.float32))
    out = xf + proj
    o_ref[0] = out.astype(o_ref.dtype).reshape(ws, W, C)


@functools.partial(jax.jit, static_argnames=("kind", "heads", "ws", "interpret"))
def fused_attn_half_block(x, wqkv, bqkv, wproj, bproj, bias, ln_scale, ln_bias,
                          mask=None, logit_scale=None, *, kind, heads, ws,
                          interpret=False):
    """x: (B, H, W, C) spatial layout (caller pre-rolls for shift); wqkv
    (C, 3C); bqkv (3C,); wproj (C, C); bproj (C,); bias (heads, N, N)
    additive score bias; ln_scale/ln_bias (C,) — V1's norm1 (pre) or V2's
    norm1 (post); mask (nW_total, N, N) additive shift mask or None;
    logit_scale (heads,) for V2 cosine attention.

    Returns x + attention-half-block residual, same shape/dtype as x.
    """
    B, H, W, C = x.shape
    N = ws * ws
    nW_row = W // ws
    has_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((1, 1, 1), x.dtype)
        mask_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        # strip r covers windows [r*nW_row, (r+1)*nW_row)
        mask_spec = pl.BlockSpec((nW_row, N, N), lambda b, r: (r, 0, 0),
                                 memory_space=pltpu.VMEM)
    if logit_scale is None:
        logit_scale = jnp.zeros((heads,), x.dtype)
    else:
        logit_scale = logit_scale.reshape(heads)

    full = lambda *shape: pl.BlockSpec(shape, lambda b, r: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, ws, W, C), lambda b, r: (b, r, 0, 0),
                          memory_space=pltpu.VMEM)

    nW_img = (H // ws) * (W // ws)
    flops = 2 * B * (ws * W) * C * 4 * C + 2 * B * nW_img * heads * N * N * (C // heads) * 2
    return pl.pallas_call(
        functools.partial(_kernel, kind=kind, heads=heads, ws=ws, W=W,
                          has_mask=has_mask),
        grid=(B, H // ws),
        in_specs=[x_spec, full(C, 3 * C), full(3 * C), full(C, C), full(C),
                  full(heads, N, N), full(C), full(C), mask_spec, full(heads)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * nW_img * heads * N * N),
        interpret=interpret,
    )(x, wqkv, bqkv, wproj, bproj, bias, ln_scale, ln_bias, mask, logit_scale)
