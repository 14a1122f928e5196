"""Fused window-attention Pallas kernel.

Both towers' hot op is a batch of *small* attentions (HTS-AT: 8x8=64-token
windows; Swin-V2: 12x12=144-token). The XLA path materializes the
(B*nW, H, N, N) attention tensor in HBM — pure HBM-bandwidth waste. This
kernel keeps scores entirely in VMEM:

  grid (num_images, heads, nW / WB); block = WB windows of one (image, head):
    scores = q @ k^T * scale + bias[h] (+ mask[w])   # f32, VMEM-resident
    out    = softmax(scores) @ v

Layouts: q/k/v/out (B, nW, H, N, D); bias (H, N, N); mask (nW, N, N). The
window axis is tiled by WB to bound the f32 score tile (WB*N*N*4 bytes) under
the scoped-VMEM limit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale, has_mask):
    q = q_ref[0, :, 0].astype(jnp.float32)   # (WB, N, D)
    k = k_ref[0, :, 0].astype(jnp.float32)
    v = v_ref[0, :, 0]
    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (WB, N, N)
    scores = scores + bias_ref[0].astype(jnp.float32)[None]
    if has_mask:
        scores = scores + mask_ref[...].astype(jnp.float32)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        attn, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (WB, N, D)
    o_ref[0, :, 0] = out.astype(o_ref.dtype)


def _pick_window_block(nW, N):
    """Largest divisor of nW keeping the f32 score tile under ~2 MB."""
    budget = 2 * 1024 * 1024
    wb = nW
    while wb > 1 and wb * N * N * 4 > budget:
        for d in range(wb - 1, 0, -1):
            if nW % d == 0:
                wb = d
                break
    return max(wb, 1)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_window_attention(q, k, v, bias, mask=None, *, scale=1.0,
                           interpret=False):
    """q/k/v: (B, nW, H, N, D); bias: (H, N, N); mask: (nW, N, N) or None.

    Returns (B, nW, H, N, D). `scale` multiplies q before the score matmul
    (pass 1.0 if q is pre-scaled, e.g. cosine attention).
    """
    B, nW, H, N, D = q.shape
    has_mask = mask is not None
    WB = _pick_window_block(nW, N)

    if mask is None:
        mask = jnp.zeros((1, 1, 1), q.dtype)  # dummy operand
        mask_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((WB, N, N), lambda i, h, w: (w, 0, 0),
                                 memory_space=pltpu.VMEM)

    qkv_spec = pl.BlockSpec((1, WB, 1, N, D), lambda i, h, w: (i, w, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda i, h, w: (h, 0, 0),
                             memory_space=pltpu.VMEM)

    flops = 2 * B * nW * H * N * N * D * 2
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, has_mask=has_mask),
        grid=(B, H, nW // WB),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=B * nW * H * N * N),
        interpret=interpret,
    )(q, k, v, bias, mask)
