"""Basic parameterized NN ops as pure functions over param pytrees.

Conventions:
  * params are nested dicts of jnp arrays;
  * linear kernels are stored `(in, out)` (JAX convention; the torch converter
    transposes `nn.Linear.weight`);
  * every op is `f(params, x, ...) -> y` and shape-polymorphic over leading axes.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers (match the torch defaults the reference relies on)
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """timm-style truncated normal in [-2, 2] stds."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch nn.Linear/nn.Conv default weight init (kaiming_uniform a=sqrt(5))."""
    bound = math.sqrt(1.0 / fan_in)  # gain for a=sqrt(5) reduces to 1/sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    p = {"kernel": kaiming_uniform(kw, (in_dim, out_dim), in_dim, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear(params, x):
    if "kernel_q" in params:  # int8-quantized frozen-tower path (ops/quant.py)
        from .quant import linear_int8
        return linear_int8(params, x)
    y = x @ params["kernel"]
    if "bias" in params:
        y = y + params["bias"]
    return y


def layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps=1e-5):
    from . import ablate
    if ablate.on("layernorm"):  # perf knockout only (ablate.py)
        return x
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * params["scale"] + params["bias"]


def mlp_init(key, dim, hidden, out=None, dtype=jnp.float32):
    out = out or dim
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, dim, hidden, dtype=dtype),
            "fc2": linear_init(k2, hidden, out, dtype=dtype)}


def gelu_exact(x):
    """torch `nn.GELU()` default is the exact erf form; jax.nn.gelu defaults
    to the tanh approximation (~1e-3 drift/layer — caught by
    tests/test_reference_golden.py on the grouping AttnBlocks)."""
    return jax.nn.gelu(x, approximate=False)


# Parity default is the exact erf GELU (torch nn.GELU()).  Serving configs
# may select the tanh approximation (`set_gelu_mode("tanh")`): in bf16
# compute the two differ by <= 3e-3 absolute (max near |x|~2), below the
# activation-magnitude bf16 rounding noise of the towers, but the erf
# lowering costs measurably more VPU time per MLP pass on v5e.
_GELU_MODE = "exact"


def set_gelu_mode(mode: str):
    """"exact" (torch-parity erf form, default) or "tanh" (serving)."""
    global _GELU_MODE
    assert mode in ("exact", "tanh"), mode
    _GELU_MODE = mode


def default_gelu(x):
    if _GELU_MODE == "tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def mlp(params, x, act=default_gelu):
    from . import ablate
    if ablate.on("gelu"):
        act = jax.nn.relu
    return linear(params["fc2"], act(linear(params["fc1"], x)))


# ---------------------------------------------------------------------------
# BatchNorm with explicit running-stat state
# ---------------------------------------------------------------------------

def batch_norm_init(dim, dtype=jnp.float32):
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype),
             "count": jnp.zeros((), jnp.int32)}
    return params, state


def batch_norm(params, state, x, *, train: bool, momentum=0.1, eps=1e-5, axis=-1):
    """BatchNorm over all axes except `axis` (the channel axis).

    Matches torch BatchNorm semantics: biased variance for normalization,
    unbiased variance tracked in the running state.
    """
    ax = axis % x.ndim
    reduce_axes = tuple(i for i in range(x.ndim) if i != ax)
    bshape = [1] * x.ndim
    bshape[ax] = x.shape[ax]

    if train:
        mu = jnp.mean(x, axis=reduce_axes)
        var = jnp.var(x, axis=reduce_axes)
        n = x.size // x.shape[ax]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mu,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mu, var = state["mean"], state["var"]
        new_state = state

    xn = (x - mu.reshape(bshape)) * jax.lax.rsqrt(var.reshape(bshape) + eps)
    y = xn * params["scale"].reshape(bshape) + params["bias"].reshape(bshape)
    return y, new_state


# ---------------------------------------------------------------------------
# grouped 1x1 "conv" == block-diagonal linear over the channel axis
# ---------------------------------------------------------------------------

def grouped_linear_init(key, in_dim, out_dim, groups, bias=False, dtype=jnp.float32):
    """Equivalent of `nn.Conv2d(in, out, 1, groups=g)` used by the adapter
    bottleneck (`DG-SCT/AVE/nets/net_trans.py:500-505`). Kernel stored as
    (groups, in//g, out//g)."""
    kw, kb = jax.random.split(key)
    gi, go = in_dim // groups, out_dim // groups
    p = {"kernel": kaiming_uniform(kw, (groups, gi, go), gi, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(gi)
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def grouped_linear(params, x):
    """x: (..., in_dim) -> (..., out_dim), block-diagonal over channel groups."""
    g, gi, go = params["kernel"].shape
    lead = x.shape[:-1]
    xg = x.reshape(lead + (g, gi))
    y = jnp.einsum("...gi,gio->...go", xg, params["kernel"])
    y = y.reshape(lead + (g * go,))
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# patch embedding (4x4 stride-4 conv == space-to-depth + linear: MXU friendly)
# ---------------------------------------------------------------------------

def patch_embed_init(key, patch, in_chans, embed_dim, norm=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_chans * patch * patch
    p = {
        # stored as conv weight laid out (patch, patch, in, embed) for the
        # space-to-depth matmul; torch converter reshapes (E, C, P, P).
        "kernel": kaiming_uniform(kw, (patch, patch, in_chans, embed_dim), fan_in, dtype),
        "bias": jax.random.uniform(kb, (embed_dim,), dtype,
                                   -1.0 / math.sqrt(fan_in), 1.0 / math.sqrt(fan_in)),
    }
    if norm:
        p["norm"] = layer_norm_init(embed_dim, dtype)
    return p


def patch_embed(params, x, patch):
    """x: (B, H, W, C) -> (B, (H/p)*(W/p), E).

    Non-overlapping patch conv implemented as space-to-depth + matmul so XLA
    maps it straight onto the MXU (no implicit im2col). Reference:
    `DG-SCT/AVE/nets/layers.py:56-86` and timm PatchEmbed.
    """
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch * patch * C)
    k = params["kernel"].reshape(patch * patch * C, -1)
    y = x @ k + params["bias"]
    if "norm" in params:
        y = layer_norm(params["norm"], y)
    return y


# ---------------------------------------------------------------------------
# spatial convs (NHWC; used by the AVS decoder)
# ---------------------------------------------------------------------------

def conv2d_init(key, kh, kw, in_ch, out_ch, bias=True, dtype=jnp.float32):
    kw_, kb = jax.random.split(key)
    fan_in = kh * kw * in_ch
    p = {"kernel": kaiming_uniform(kw_, (kh, kw, in_ch, out_ch), fan_in, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def conv2d(params, x, *, stride=1, padding="SAME", dilation=1):
    """x: (N, H, W, C) -> (N, H', W', C')."""
    y = jax.lax.conv_general_dilated(
        x, params["kernel"], window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params:
        y = y + params["bias"]
    return y


# ---------------------------------------------------------------------------
# stochastic ops
# ---------------------------------------------------------------------------

def dropout(rng, x, rate, train):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def drop_path(rng, x, rate, train):
    """Stochastic depth on the leading (batch) axis. `rate` may be a traced
    scalar (inside lax.scan over blocks with varying dprs): bernoulli(keep=1)
    is always True and x/1.0 is exact, so a traced rate of 0 is the identity
    bit-for-bit, matching the static fast path."""
    if not train:
        return x
    if isinstance(rate, (int, float)) and rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# on-device image preprocessing (the serving/e2e ingest prologue)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_frames_u8(frames, dtype=jnp.bfloat16,
                        mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """uint8 (..., H, W, 3) frames -> normalized `dtype` on device.

    The serving ingest prologue: hosts ship raw uint8 (4x fewer PCIe bytes
    than float32) and XLA fuses this cast/scale/shift into the first conv —
    replacing the reference's host-side torchvision Normalize
    (DG-SCT/AVE/dataloader.py:61-64)."""
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    return ((frames.astype(jnp.float32) - m) / s).astype(dtype)


def normalize_frames_yuv420(y_u8, uv_u8, dtype=jnp.bfloat16,
                            mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Half-payload ingest prologue: y (..., S, S) + uv (..., S/2, S/2, 2)
    uint8 planes (native.load_jpeg_batch_yuv420) -> normalized (..., S, S, 3).

    The chroma upsample is a baked bicubic matmul pair (ops.dsp.resize_2d)
    and the JFIF full-range YCbCr->RGB conversion composes with /255 and the
    ImageNet affine into ONE (3, 3) matmul + offset, fused by XLA into the
    tower's first conv.  Ships 1.5 bytes/px instead of 3 — the tunnel-ingest
    clips/s cap (bench_e2e) doubles for the frame payload."""
    from . import dsp
    *lead, S, _ = y_u8.shape
    yf = y_u8.astype(jnp.float32)
    uvf = uv_u8.astype(jnp.float32).reshape((-1,) + uv_u8.shape[-3:])
    uvf = dsp.resize_2d(uvf, S, S, kernel="cubic", align_corners=False)
    uvf = uvf.reshape(tuple(lead) + (S, S, 2))
    ycc = jnp.concatenate([yf[..., None], uvf - 128.0], axis=-1)
    # JFIF full-range: R = Y + 1.402 Cr'; G = Y - .344136 Cb' - .714136 Cr';
    # B = Y + 1.772 Cb'   (columns: R, G, B; rows: Y, Cb', Cr')
    conv = jnp.asarray([[1.0, 1.0, 1.0],
                        [0.0, -0.344136, 1.772],
                        [1.402, -0.714136, 0.0]], jnp.float32)
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    rgb = ycc @ conv
    return ((rgb - m) / s).astype(dtype)


MULAW_MU = 255.0


def encode_mulaw_u8(wave: "np.ndarray") -> "np.ndarray":
    """Host-side continuous mu-law companding of float waveform in [-1, 1]
    (or i16 PCM) to uint8 — halves the audio wire bytes vs i16 at ~38 dB
    SNR, below the log-mel frontend's bf16-STFT drift floor
    (tests/test_native_io.py::test_mulaw_roundtrip)."""
    x = wave.astype(np.float32)
    if wave.dtype == np.int16:
        x = x / 32767.0
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MULAW_MU * np.abs(x)) / np.log1p(MULAW_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def dequantize_mulaw_u8(wave_u8, dtype=jnp.float32):
    """Device-side inverse of `encode_mulaw_u8`: uint8 -> waveform in [-1,1].
    Fuses into the STFT framing prologue like the i16 dequantize."""
    y = wave_u8.astype(jnp.float32) / 127.5 - 1.0
    x = jnp.sign(y) * (jnp.power(1.0 + MULAW_MU, jnp.abs(y)) - 1.0) / MULAW_MU
    return x.astype(dtype)
