"""Fused window-attention Pallas kernel.

Both towers' hot op is a batch of *small* attentions (HTS-AT: 8x8=64-token
windows; Swin-V2: 12x12=144-token). The XLA path materializes the
(B*nW, H, N, N) attention tensor in HBM; this kernel keeps scores in VMEM.

The kernel consumes q/k/v in their NATIVE (Bw, N, H, D) layout (exactly what
the qkv projection's reshape produces) — profiling showed that transposing
into a head-major layout cost more in relayout copies (~73% of device time)
than the attention itself. Blocks slice WB windows x one head:

  grid (Bw / WB, H); block q/k/v (WB, N, 1, D):
    scores = q @ k^T * scale + bias[h] (+ mask)   # f32, VMEM-resident
    out    = softmax(scores) @ v

Masks repeat every nW windows; WB is chosen to divide nW so a block never
crosses an image boundary.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale, has_mask,
            num_heads):
    # heads stay whole in the block (Mosaic requires the trailing dims be
    # full or tile-aligned); unroll the small head loop in-kernel instead.
    for h in range(num_heads):
        q = q_ref[:, :, h, :].astype(jnp.float32)   # (WB, N, D)
        k = k_ref[:, :, h, :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (WB, N, N)
        scores = scores + bias_ref[h].astype(jnp.float32)[None]
        if has_mask:
            scores = scores + mask_ref[...].astype(jnp.float32)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)
        # contract against the rank-4 v slice so the output is already
        # (WB, N, 1, D) — Mosaic can't shape-cast a rank-3 value into a
        # rank-4 store slot
        v4 = v_ref[:, :, h:h + 1, :]
        out = jax.lax.dot_general(
            attn, v4,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (WB, N, 1, D)
        o_ref[:, :, h:h + 1, :] = out.astype(o_ref.dtype)


def _pick_window_block(nW, N, H, D, itemsize=2):
    """Largest divisor of nW fitting the block's VMEM working set: 4 qkv/out
    tiles (double-buffered) + f32 score/softmax temporaries, under ~10 MB of
    the 16 MB scoped budget."""
    budget = 3 * 1024 * 1024  # empirically ~3x headroom vs Mosaic's scoped accounting
    per_wb = 8 * N * H * D * itemsize + 6 * N * N * 4
    wb = nW
    while wb > 1 and wb * per_wb > budget:
        for d in range(wb - 1, 0, -1):
            if nW % d == 0:
                wb = d
                break
    return max(wb, 1)


@functools.partial(jax.jit, static_argnames=("nW", "scale", "interpret"))
def fused_window_attention(q, k, v, bias, mask=None, *, nW=1, scale=1.0,
                           interpret=False):
    """q/k/v: (Bw, N, H, D) native layout, Bw = images * nW; bias (H, N, N);
    mask (nW, N, N) or None. Returns (Bw, N, H, D). `scale` multiplies q
    before the score matmul (pass 1.0 if q is pre-scaled)."""
    Bw, N, H, D = q.shape
    has_mask = mask is not None
    WB = _pick_window_block(nW, N, H, D, q.dtype.itemsize)

    if mask is None:
        mask = jnp.zeros((1, 1, 1), q.dtype)  # dummy operand
        mask_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        blocks_per_img = nW // WB
        mask_spec = pl.BlockSpec((WB, N, N), lambda i: (i % blocks_per_img, 0, 0),
                                 memory_space=pltpu.VMEM)

    qkv_spec = pl.BlockSpec((WB, N, H, D), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((H, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    flops = 2 * Bw * H * N * N * D * 2
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, has_mask=has_mask, num_heads=H),
        grid=(Bw // WB,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=Bw * H * N * N),
        interpret=interpret,
    )(q, k, v, bias, mask)
