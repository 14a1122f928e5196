"""Windowed-attention utilities shared by both towers.

TPU-first design notes: window partition/reverse are pure reshapes+transposes
(zero-copy layout changes under XLA), attention masks and relative-position
index tables are *static* numpy constants baked at trace time, and the
attention itself is a batch of small matmuls that XLA tiles onto the MXU.

Reference behavior: `DG-SCT/AVE/nets/htsat.py:20-131` (V1 window attention w/
relative position bias) and timm 0.6.12 `swin_transformer_v2.py` (scaled-cosine
attention + log-CPB MLP bias) driven externally at `net_trans.py:894-914`.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .basic import linear, linear_init, kaiming_uniform, trunc_normal


def window_partition(x, ws):
    """(B, H, W, C) -> (B * nW, ws*ws, C), row-major over window grid
    (matches htsat.py:20-31)."""
    from . import ablate
    B, H, W, C = x.shape
    if ablate.on("winlayout"):  # perf knockout: no transpose (wrong grouping)
        return x.reshape(-1, ws * ws, C)
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    """(B*nW, ws*ws, C) -> (B, H, W, C) (matches htsat.py:34-47)."""
    from . import ablate
    nW = (H // ws) * (W // ws)
    B = wins.shape[0] // nW
    if ablate.on("winlayout"):  # perf knockout: no transpose (wrong grouping)
        return wins.reshape(B, H, W, -1)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


@functools.lru_cache(maxsize=None)
def relative_position_index(ws_h: int, ws_w: int) -> np.ndarray:
    """(ws_h*ws_w, ws_h*ws_w) index into the (2h-1)(2w-1) bias table
    (htsat.py:76-87; identical in Swin-V2)."""
    coords = np.stack(np.meshgrid(np.arange(ws_h), np.arange(ws_w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws_h - 1
    rel[:, :, 1] += ws_w - 1
    rel[:, :, 0] *= 2 * ws_w - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask (0 / -100) for shifted windows
    (htsat.py:185-208; timm swinv2 uses the same construction)."""
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def shift_attn_mask_jnp(H: int, W: int, ws: int, shift: int):
    """Mask as a jnp constant. NOTE: must NOT be lru-cached as a jnp array —
    inside jit, jnp.asarray stages a tracer, and caching it across traces
    leaks (XLA dedupes identical constants at compile time anyway)."""
    return jnp.asarray(shift_attn_mask(H, W, ws, shift))


def relative_position_index_jnp(ws_h: int, ws_w: int):
    return jnp.asarray(relative_position_index(ws_h, ws_w).reshape(-1))


def log_cpb_coords_table_jnp(ws_h: int, ws_w: int, pretrained_ws: int = 0):
    return jnp.asarray(log_cpb_coords_table(ws_h, ws_w, pretrained_ws))


@functools.lru_cache(maxsize=None)
def log_cpb_coords_table(ws_h: int, ws_w: int, pretrained_ws: int = 0) -> np.ndarray:
    """((2h-1)*(2w-1), 2) log-spaced continuous relative coords for the Swin-V2
    CPB MLP (timm 0.6.12 WindowAttention.__init__)."""
    rh = np.arange(-(ws_h - 1), ws_h, dtype=np.float32)
    rw = np.arange(-(ws_w - 1), ws_w, dtype=np.float32)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1)  # (2h-1, 2w-1, 2)
    denom_h = (pretrained_ws - 1) if pretrained_ws > 0 else (ws_h - 1)
    denom_w = (pretrained_ws - 1) if pretrained_ws > 0 else (ws_w - 1)
    table[:, :, 0] /= denom_h
    table[:, :, 1] /= denom_w
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2).astype(np.float32)


# ---------------------------------------------------------------------------
# attention core: XLA einsum path or fused Pallas kernel
# ---------------------------------------------------------------------------

USE_PALLAS = False  # set via set_pallas(); read at trace time
# int8 attention core for quantized towers: numerics verified on CPU
# (tests/test_quant.py::test_window_attention_v2_int8_core_matches_fp) but
# NOT yet measured through the tunnel'd chip — early sweep points suggest a
# large compile-time cost, so it stays opt-in until a committed measurement
# shows a throughput win (see NOTES.md).
USE_INT8_ATTN = False


def set_pallas(enabled: bool) -> None:
    """Route window attention through the fused Pallas kernel (TPU only)."""
    global USE_PALLAS
    USE_PALLAS = enabled


def set_int8_attn(enabled: bool) -> None:
    """Route quantized-tower window attention through the int8 MXU core."""
    global USE_INT8_ATTN
    USE_INT8_ATTN = enabled


def _attn_core_int8(qn, kn, v, logit_scale, bias, mask, out_dtype, nW=1):
    """Int8 cosine-attention core for quantized (serving) Swin-V2 towers.

    qn/kn are L2-normalized per row, so every element is in [-1, 1] and the
    static scale 1/127 is exact — no calibration needed. The measured win is
    twofold: the skinny score/context GEMMs (144x32x144 @ 14 TF/s bf16) run
    on the int8 MXU (~18 TOPS at these shapes, perf/roofline.py), and the
    (Bw, H, N, N) score/probability intermediates — the dominant HBM bytes of
    the attention half — are materialized in int8, half the bf16 traffic.
    The softmax output is in [0, 1] so its 1/127 static scale is exact too;
    v gets a cheap per-(window, head, channel) dynamic scale (a 144-element
    reduce, fused by XLA). logit_scale: (H,) per-head cosine temperature,
    applied at dequant instead of being folded into q."""
    Bw, N, H, D = qn.shape
    qq = jnp.clip(jnp.round(qn.astype(jnp.float32) * 127.0), -127, 127).astype(jnp.int8)
    kq = jnp.clip(jnp.round(kn.astype(jnp.float32) * 127.0), -127, 127).astype(jnp.int8)
    # bnhd,bmhd->bhnm on the int8 MXU
    attn = jax.lax.dot_general(
        qq, kq, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.int32)  # (Bw, H, N, N)
    scale = (logit_scale.astype(jnp.float32) / (127.0 * 127.0)).reshape(1, H, 1, 1)
    attn = attn.astype(jnp.float32) * scale
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(Bw // nW, nW, H, N, N) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(Bw, H, N, N)
    p = jax.nn.softmax(attn, axis=-1)
    pq = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
    vf = v.astype(jnp.float32)
    vscale = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True), 1e-8) / 127.0
    vq = jnp.clip(jnp.round(vf / vscale), -127, 127).astype(jnp.int8)  # (Bw, M, H, D)
    # bhnm,bmhd->bhnd on the int8 MXU
    out = jax.lax.dot_general(
        pq, vq, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.int32)  # (Bw, H, N, D)
    out = out.astype(jnp.float32) * (vscale.transpose(0, 2, 1, 3) / 127.0)
    return out.transpose(0, 2, 1, 3).reshape(Bw, N, H * D).astype(out_dtype)


def _attn_core(q, k, v, bias, mask, out_dtype, nW=1):
    """q/k/v: (Bw, N, H, D) with q pre-scaled; bias (H, N, N); mask (nW, N, N)
    or None; nW = windows per image (for per-image VMEM blocking).
    Returns (Bw, N, H*D)."""
    Bw, N, H, D = q.shape
    if USE_PALLAS:
        from .pallas.window_attention import fused_window_attention
        out = fused_window_attention(q, k, v, bias.astype(q.dtype),
                                     mask.astype(q.dtype) if mask is not None else None,
                                     nW=nW)
        return out.reshape(Bw, N, H * D).astype(out_dtype)
    # accumulate scores in f32 on the MXU but MATERIALIZE them in the compute
    # dtype — the (Bw, H, N, N) tensors dominate HBM traffic in bf16 runs
    # (f32 runs are unchanged: astype is a no-op)
    from . import ablate
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32).astype(q.dtype)
    if not ablate.on("biasadd"):
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, H, N, N) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bw, H, N, N)
    if ablate.on("softmax"):
        attn = (attn * (1.0 / N)).astype(out_dtype)
    else:
        attn = jax.nn.softmax(attn, axis=-1).astype(out_dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bw, N, H * D)


# ---------------------------------------------------------------------------
# V1 window attention (HTS-AT): scaled dot-product + learned rel-pos bias table
# ---------------------------------------------------------------------------

def attention_v1_init(key, dim, ws, num_heads, qkv_bias=True, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "qkv": linear_init(k1, dim, dim * 3, bias=qkv_bias, dtype=dtype),
        "proj": linear_init(k2, dim, dim, dtype=dtype),
        "rpb_table": trunc_normal(k3, ((2 * ws - 1) * (2 * ws - 1), num_heads), dtype=dtype),
    }
    return p


def window_attention_v1(params, x, *, num_heads, ws, mask=None, nW=1):
    """x: (Bw, N, C) windows; returns (Bw, N, C).

    Pre-norm V1 attention with additive relative-position bias
    (htsat.py:97-128)."""
    Bw, N, C = x.shape
    hd = C // num_heads
    qkv = linear(params["qkv"], x).reshape(Bw, N, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (Bw, N, h, hd)
    q = q * (hd ** -0.5)

    idx = relative_position_index_jnp(ws, ws)
    bias = params["rpb_table"][idx].reshape(N, N, num_heads).transpose(2, 0, 1)

    out = _attn_core(q, k, v, bias, mask, x.dtype, nW)
    return linear(params["proj"], out)


# ---------------------------------------------------------------------------
# V2 window attention (Swin-V2): scaled cosine + log-CPB MLP bias
# ---------------------------------------------------------------------------

def attention_v2_init(key, dim, num_heads, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "qkv": {"kernel": kaiming_uniform(k1, (dim, dim * 3), dim, dtype)},  # no fused bias
        "q_bias": jnp.zeros((dim,), dtype),
        "v_bias": jnp.zeros((dim,), dtype),
        "logit_scale": jnp.log(10.0 * jnp.ones((num_heads, 1, 1), dtype)),
        "cpb_fc1": linear_init(k2, 2, 512, dtype=dtype),
        "cpb_fc2": {"kernel": kaiming_uniform(k3, (512, num_heads), 512, dtype)},
        "proj": linear_init(k4, dim, dim, dtype=dtype),
    }


def window_attention_v2(params, x, *, num_heads, ws, mask=None, pretrained_ws=0, nW=1):
    """Scaled-cosine window attention with log-CPB bias (timm 0.6.12 semantics;
    exercised via `blk._attn` at `net_trans.py:894`). x: (Bw, N, C)."""
    Bw, N, C = x.shape
    hd = C // num_heads
    qkv_bias = jnp.concatenate([
        params["q_bias"], jnp.zeros_like(params["v_bias"]), params["v_bias"]])
    qkv = (linear(params["qkv"], x) + qkv_bias).reshape(Bw, N, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    from . import ablate
    # int8 attention core (opt-in, set_int8_attn): for quantized (serving)
    # towers the cosine path's unit-norm q/k and [0,1] softmax make static
    # scales exact
    int8_core = (USE_INT8_ATTN and "kernel_q" in params["qkv"]
                 and not ablate.any_on())
    if ablate.on("cosnorm"):
        qn, kn = q * (hd ** -0.5), k
    else:
        qn = q * jax.lax.rsqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True) + 1e-12)
        kn = k * jax.lax.rsqrt(jnp.sum(jnp.square(k), axis=-1, keepdims=True) + 1e-12)
        logit_scale = jnp.exp(jnp.minimum(params["logit_scale"], math.log(1.0 / 0.01)))
        if not int8_core:
            # fold the per-head logit scale into q (scores are linear in q)
            qn = qn * logit_scale[:, 0, 0][None, None, :, None].astype(qn.dtype)

    table = log_cpb_coords_table_jnp(ws, ws, pretrained_ws).astype(x.dtype)
    cpb = linear(params["cpb_fc2"], jax.nn.relu(linear(params["cpb_fc1"], table)))
    idx = relative_position_index_jnp(ws, ws)
    bias = cpb[idx].reshape(N, N, num_heads).transpose(2, 0, 1)
    bias = 16.0 * jax.nn.sigmoid(bias)

    if int8_core:
        out = _attn_core_int8(qn, kn, v, logit_scale[:, 0, 0], bias, mask,
                              x.dtype, nW)
    else:
        out = _attn_core(qn, kn, v, bias, mask, x.dtype, nW)
    return linear(params["proj"], out)


def shifted_window_attention(attn_fn, x, *, H, W, ws, shift):
    """Full spatial attention step: roll -> partition -> attn -> reverse -> unroll.

    `attn_fn(windows, mask, nW)` does the per-window attention. x: (B, H*W, C)."""
    from . import ablate
    B, L, C = x.shape
    if ablate.on("roll"):
        shift = 0
    xs = x.reshape(B, H, W, C)
    if shift > 0:
        xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        mask = shift_attn_mask_jnp(H, W, ws, shift)
    else:
        mask = None
    wins = window_partition(xs, ws)
    wins = attn_fn(wins, mask, (H // ws) * (W // ws))
    xs = window_reverse(wins, ws, H, W)
    if shift > 0:
        xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
    return xs.reshape(B, L, C)


# ---------------------------------------------------------------------------
# fully-fused attention half-block (Pallas): qkv -> windows -> softmax -> proj
# -> norm -> residual in one VMEM pass. See ops/pallas/block_attention.py.
# ---------------------------------------------------------------------------

def _dense_kernel(p):
    """Dense kernel of a (possibly int8-quantized) linear param dict — the
    fused Pallas path always consumes dense weights."""
    if "kernel" in p:
        return p["kernel"]
    return p["kernel_q"].astype(jnp.float32) * p["kscale"][None, :]


USE_FUSED_BLOCK = False


def set_fused_block(enabled: bool) -> None:
    """Route eligible attention half-blocks through the fully-fused Pallas
    kernel (TPU only; eval path)."""
    global USE_FUSED_BLOCK
    USE_FUSED_BLOCK = enabled


def fused_block_eligible(C: int, heads: int, train: bool) -> bool:
    """Kernel applies on the eval path for stages whose qkv weights fit the
    VMEM block budget (C <= 768 keeps weights+strip+bias well under 16 MB);
    the tiny final stages (C=1536 visual) stay on the XLA path."""
    return USE_FUSED_BLOCK and not train and C <= 768 and C % heads == 0


def fused_half_block(params, x, *, kind, heads, res, ws, shift,
                     pretrained_ws=0, interpret=False):
    """x: (B, L, C) -> x + attention-half-block residual.

    kind="v1": x + proj(attn_v1(LN1(x)))   (HTS-AT pre-norm half)
    kind="v2": x + LN1(proj(attn_v2(x)))   (Swin-V2 post-norm half)
    """
    from .pallas.block_attention import fused_attn_half_block

    H, W = res
    B, L, C = x.shape
    N = ws * ws
    ap = params["attn"]

    if kind == "v2":
        table = log_cpb_coords_table_jnp(ws, ws, pretrained_ws).astype(jnp.float32)
        cpb = linear(ap["cpb_fc2"], jax.nn.relu(linear(ap["cpb_fc1"], table)))
        idx = relative_position_index_jnp(ws, ws)
        bias = 16.0 * jax.nn.sigmoid(cpb[idx].reshape(N, N, heads).transpose(2, 0, 1))
        wqkv = _dense_kernel(ap["qkv"])
        bqkv = jnp.concatenate([ap["q_bias"], jnp.zeros_like(ap["v_bias"]),
                                ap["v_bias"]])
        logit_scale = ap["logit_scale"].reshape(heads)
    else:
        idx = relative_position_index_jnp(ws, ws)
        bias = ap["rpb_table"][idx].reshape(N, N, heads).transpose(2, 0, 1)
        wqkv = _dense_kernel(ap["qkv"])
        bqkv = ap["qkv"]["bias"]
        logit_scale = None

    ln = params["norm1"]
    xs = x.reshape(B, H, W, C)
    mask = None
    if shift > 0:
        xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        mask = shift_attn_mask_jnp(H, W, ws, shift)
    out = fused_attn_half_block(
        xs, wqkv.astype(x.dtype), bqkv.astype(x.dtype),
        ap["proj"]["kernel"].astype(x.dtype), ap["proj"]["bias"].astype(x.dtype),
        bias.astype(x.dtype), ln["scale"].astype(x.dtype),
        ln["bias"].astype(x.dtype),
        mask=None if mask is None else mask.astype(x.dtype),
        logit_scale=None if logit_scale is None else logit_scale.astype(x.dtype),
        kind=kind, heads=heads, ws=ws, interpret=interpret)
    if shift > 0:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out.reshape(B, L, C)
