"""Fused DG-SCT adapter stage-5 bottleneck Pallas kernel.

The adapter-stage knockouts (`perf/results_r5/knockouts_adstages.log`)
attribute essentially the ENTIRE 12.4 ms adapter tail of the 51.6 ms int8
serving step to stage 5: ln_before -> grouped down -> ReLU -> grouped up ->
ln_post (gate pre-folded by `models/adapter.fold_eval`).  Its two grouped
GEMMs are tiny — per-group output widths C/16 (12..96 lanes), far below the
128-wide MXU tile — so the stage is bound by HBM PASSES over the (rows, C)
token stream, not FLOPs: XLA schedules it as an LN pass, down+relu, up, and
a second LN pass = 4+ round trips over the activations.

This kernel runs the whole stage in ONE VMEM-resident pass over row tiles:
x is read once, the stage-5 residual written once, weights stay resident.
The grouped bottleneck chains group-wise (down group g feeds exactly up
group g through the elementwise ReLU — block-diagonal both sides), so each
group runs down->relu->up privately and only the final (R, C/g) pieces
concatenate for the ln_post row statistics.

Serving/eval only, AVE/AVVP/AVQA epilogue order (ln_post last); BN must
already be folded into the GEMM biases.  Reference semantics:
`DG-SCT/AVE/nets/net_trans.py:626-671`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, wd_ref, bd_ref, wu_ref, bu_ref, ln1s_ref, ln1b_ref,
            ln2s_ref, ln2b_ref, o_ref, *, groups, has_ln1):
    x = x_ref[...]                                   # (Rt, C)
    C = x.shape[-1]
    gi = C // groups                                 # down in-width per group
    xf = x.astype(jnp.float32)
    z = _ln_f32(xf, ln1s_ref[...].astype(jnp.float32),
                ln1b_ref[...].astype(jnp.float32)) if has_ln1 else xf

    go = wd_ref.shape[-1]                            # down out-width per group
    pieces = []
    for g in range(groups):                          # static unroll (g = 2|4)
        zg = z[:, g * gi:(g + 1) * gi].astype(x.dtype)
        hg = jax.lax.dot(zg, wd_ref[g], preferred_element_type=jnp.float32)
        hg = jnp.maximum(hg + bd_ref[g * go:(g + 1) * go].astype(jnp.float32),
                         0.0)
        og = jax.lax.dot(hg.astype(x.dtype), wu_ref[g],
                         preferred_element_type=jnp.float32)
        pieces.append(og + bu_ref[g * gi:(g + 1) * gi].astype(jnp.float32))
    o = pieces[0] if groups == 1 else jnp.concatenate(pieces, axis=-1)
    o = _ln_f32(o, ln2s_ref[...].astype(jnp.float32),
                ln2b_ref[...].astype(jnp.float32))
    o_ref[...] = o.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("has_ln1", "row_tile", "interpret"))
def _bottleneck_rows(x, wd, bd, wu, bu, ln1s, ln1b, ln2s, ln2b, *,
                     has_ln1, row_tile, interpret):
    rows, C = x.shape
    g = wd.shape[0]
    kern = functools.partial(_kernel, groups=g, has_ln1=has_ln1)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    return pl.pallas_call(
        kern,
        grid=(rows // row_tile,),
        in_specs=[pl.BlockSpec((row_tile, C), lambda i: (i, 0)),
                  full(wd), full(bd), full(wu), full(bu),
                  full(ln1s), full(ln1b), full(ln2s), full(ln2b)],
        out_specs=pl.BlockSpec((row_tile, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        interpret=interpret,
    )(x, wd, bd, wu, bu, ln1s, ln1b, ln2s, ln2b)


def fused_bottleneck(params, x, *, has_ln1: bool, row_tile: int = 0,
                     interpret=None):
    """Adapter stage 5 on x (B, N, C) -> residual (B, N, C).

    `params` is the post-`fold_eval` adapter dict: grouped `down`/`up`
    ((g, in/g, out/g) kernels, optional flat biases), `ln_post`, and
    `ln_before` when `has_ln1`.  Rows are padded up to `row_tile`; the pad
    is sliced off after the kernel.  `interpret=None` auto-selects the
    Pallas interpreter off-TPU so tests run on the CPU mesh unchanged.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, C = x.shape
    if not row_tile:
        # target ~1 MB x-blocks so the block DMAs amortize (256-row tiles at
        # C=192 measured 8% SLOWER than XLA: 98 KB DMAs x 360 grid steps)
        row_tile = max(256, (min(2048, 2 ** 20 // (C * x.dtype.itemsize))
                             // 256) * 256)
    wd, wu = params["down"]["kernel"], params["up"]["kernel"]
    g, _, go = wd.shape
    zeros = lambda n: jnp.zeros((n,), x.dtype)
    bd = params["down"].get("bias", zeros(g * go))
    bu = params["up"].get("bias", zeros(C))
    ln2 = params["ln_post"]
    ln1 = params.get("ln_before", {"scale": zeros(C), "bias": zeros(C)})
    rows = B * N
    pad = (-rows) % row_tile
    xr = x.reshape(rows, C)
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    out = _bottleneck_rows(
        xr, wd, bd.astype(x.dtype), wu, bu.astype(x.dtype),
        ln1["scale"], ln1["bias"], ln2["scale"], ln2["bias"],
        has_ln1=has_ln1, row_tile=row_tile, interpret=bool(interpret))
    return out[:rows].reshape(B, N, C)
