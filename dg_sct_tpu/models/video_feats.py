"""Frame/clip feature extractors for the pretrain pipeline — JAX-native
rebuilds of the backbones behind `pretrain/scripts/extract_rgb_feat.py`
(torchvision resnet152, 2048-d per frame) and `extract_3D_feat.py`
(torchvision r2plus1d_18, 512-d per 8-frame clip). The reference runs them as
one-off CUDA scripts; here they are pure init/apply functions with torch
state-dict converters (`*_from_torch`) so released torchvision weights load
when available, and they jit/batch onto the MXU.

All NHWC / NTHWC; BN is inference-mode (running stats) — these backbones are
feature extractors, never trained here (matching the scripts' frozen use).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import conv2d_init, linear_init


# ---------------------------------------------------------------------------
# shared helpers: inference BatchNorm folded to scale/shift
# ---------------------------------------------------------------------------

def _bn_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype),
            "mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _t(v):
    return jnp.asarray(np.asarray(v), jnp.float32)


def _bn_from_torch(state, prefix):
    return {"scale": _t(state[f"{prefix}.weight"]),
            "bias": _t(state[f"{prefix}.bias"]),
            "mean": _t(state[f"{prefix}.running_mean"]),
            "var": _t(state[f"{prefix}.running_var"])}


def _conv_from_torch(state, key):
    # torch conv2d weight (out, in, kh, kw) -> HWIO
    return {"kernel": _t(state[key]).transpose(2, 3, 1, 0)}


# ---------------------------------------------------------------------------
# torchvision-style ResNet-152 (Bottleneck 1x1 -> 3x3(stride) -> 1x1)
# ---------------------------------------------------------------------------

RESNET152_LAYERS = (3, 8, 36, 3)


def _conv(key, k, cin, cout, dtype):
    return conv2d_init(key, k, k, cin, cout, bias=False, dtype=dtype)


def init_resnet152(key, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = {"conv1": _conv(ks[0], 7, 3, 64, dtype), "bn1": _bn_init(64, dtype)}
    inplanes = 64
    for li, (blocks, planes) in enumerate(zip(RESNET152_LAYERS,
                                              (64, 128, 256, 512))):
        stride = 1 if li == 0 else 2
        layer = []
        for b in range(blocks):
            kk = jax.random.split(jax.random.fold_in(ks[1], li * 100 + b), 4)
            blk = {"conv1": _conv(kk[0], 1, inplanes, planes, dtype),
                   "bn1": _bn_init(planes, dtype),
                   "conv2": _conv(kk[1], 3, planes, planes, dtype),
                   "bn2": _bn_init(planes, dtype),
                   "conv3": _conv(kk[2], 1, planes, planes * 4, dtype),
                   "bn3": _bn_init(planes * 4, dtype)}
            if b == 0 and (stride != 1 or inplanes != planes * 4):
                blk["down_conv"] = _conv(kk[3], 1, inplanes, planes * 4, dtype)
                blk["down_bn"] = _bn_init(planes * 4, dtype)
            inplanes = planes * 4
            layer.append(blk)
        p[f"layer{li + 1}"] = layer
    return p


def resnet152_from_torch(state):
    """Convert a torchvision `resnet152` state dict (fc ignored — the script
    drops it, extract_rgb_feat.py:96)."""
    p = {"conv1": _conv_from_torch(state, "conv1.weight"),
         "bn1": _bn_from_torch(state, "bn1")}
    inplanes = 64
    for li, (blocks, planes) in enumerate(zip(RESNET152_LAYERS,
                                              (64, 128, 256, 512))):
        stride = 1 if li == 0 else 2
        layer = []
        for b in range(blocks):
            base = f"layer{li + 1}.{b}"
            blk = {"conv1": _conv_from_torch(state, f"{base}.conv1.weight"),
                   "bn1": _bn_from_torch(state, f"{base}.bn1"),
                   "conv2": _conv_from_torch(state, f"{base}.conv2.weight"),
                   "bn2": _bn_from_torch(state, f"{base}.bn2"),
                   "conv3": _conv_from_torch(state, f"{base}.conv3.weight"),
                   "bn3": _bn_from_torch(state, f"{base}.bn3")}
            if f"{base}.downsample.0.weight" in state:
                blk["down_conv"] = _conv_from_torch(state, f"{base}.downsample.0.weight")
                blk["down_bn"] = _bn_from_torch(state, f"{base}.downsample.1")
            inplanes = planes * 4
            layer.append(blk)
        p[f"layer{li + 1}"] = layer
    return p


def _c2d(p, x, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def resnet152_features(params, images):
    """images: (B, 224, 224, 3) normalized -> (B, 2048) avg-pooled features
    (torchvision forward minus fc)."""
    x = _c2d(params["conv1"], images, stride=2, pad=3)
    x = jax.nn.relu(_bn(params["bn1"], x))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li in range(1, 5):
        for b, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and b == 0) else 1  # static (not traced)
            idn = x
            y = jax.nn.relu(_bn(blk["bn1"], _c2d(blk["conv1"], x)))
            y = jax.nn.relu(_bn(blk["bn2"], _c2d(blk["conv2"], y,
                                                 stride=stride, pad=1)))
            y = _bn(blk["bn3"], _c2d(blk["conv3"], y))
            if "down_conv" in blk:
                idn = _bn(blk["down_bn"], _c2d(blk["down_conv"], x,
                                               stride=stride))
            x = jax.nn.relu(y + idn)
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# torchvision-style R(2+1)D-18 video backbone
# ---------------------------------------------------------------------------

def _midplanes(cin, cout, t=3, d=3):
    """torchvision Conv2Plus1D mid-channel rule (resnet R(2+1)D paper eq.):
    floor(t*d^2*cin*cout / (d^2*cin + t*cout))."""
    return (t * d * d * cin * cout) // (d * d * cin + t * cout)


def _c3d(p, x, stride, pad):
    return jax.lax.conv_general_dilated(
        x, p["kernel"], stride, [(pp, pp) for pp in pad],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def _conv3d_init(key, kt, kh, kw, cin, cout, dtype):
    import math
    fan_in = kt * kh * kw * cin
    bound = math.sqrt(2.0 / fan_in)
    return {"kernel": jax.random.normal(key, (kt, kh, kw, cin, cout), dtype) * bound}


def _conv3d_from_torch(state, key):
    # torch conv3d weight (out, in, kt, kh, kw) -> THWIO
    return {"kernel": _t(state[key]).transpose(2, 3, 4, 1, 0)}


def init_r2plus1d_18(key, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    stem_mid = 45
    p = {"stem_s": _conv3d_init(ks[0], 1, 7, 7, 3, stem_mid, dtype),
         "stem_bn_s": _bn_init(stem_mid, dtype),
         "stem_t": _conv3d_init(ks[1], 3, 1, 1, stem_mid, 64, dtype),
         "stem_bn_t": _bn_init(64, dtype)}
    inplanes = 64
    for li, planes in enumerate((64, 128, 256, 512)):
        stride = 1 if li == 0 else 2
        layer = []
        for b in range(2):
            kk = jax.random.split(jax.random.fold_in(ks[2], li * 10 + b), 8)
            s = stride if b == 0 else 1
            blk = {}
            # torchvision computes midplanes ONCE per block from
            # (inplanes, planes) and reuses it for conv2
            mid = _midplanes(inplanes, planes)
            cin = inplanes
            for ci in (1, 2):
                blk[f"conv{ci}_s"] = _conv3d_init(kk[ci * 3 - 3], 1, 3, 3, cin, mid, dtype)
                blk[f"bn{ci}_s"] = _bn_init(mid, dtype)
                blk[f"conv{ci}_t"] = _conv3d_init(kk[ci * 3 - 2], 3, 1, 1, mid, planes, dtype)
                blk[f"bn{ci}"] = _bn_init(planes, dtype)
                cin = planes
            if b == 0 and (s != 1 or inplanes != planes):
                blk["down_conv"] = _conv3d_init(kk[7], 1, 1, 1, inplanes, planes, dtype)
                blk["down_bn"] = _bn_init(planes, dtype)
            inplanes = planes
            layer.append(blk)
        p[f"layer{li + 1}"] = layer
    return p


def r2plus1d_18_from_torch(state):
    """Convert a torchvision `r2plus1d_18` state dict (fc ignored).
    torchvision layout: stem.0/1/3/4; layerN.B.conv1.0.{0,1,3}, bn1, ..."""
    p = {"stem_s": _conv3d_from_torch(state, "stem.0.weight"),
         "stem_bn_s": _bn_from_torch(state, "stem.1"),
         "stem_t": _conv3d_from_torch(state, "stem.3.weight"),
         "stem_bn_t": _bn_from_torch(state, "stem.4")}
    inplanes = 64
    for li, planes in enumerate((64, 128, 256, 512)):
        stride = 1 if li == 0 else 2
        layer = []
        for b in range(2):
            base = f"layer{li + 1}.{b}"
            blk = {}
            for ci in (1, 2):
                cb = f"{base}.conv{ci}.0"
                blk[f"conv{ci}_s"] = _conv3d_from_torch(state, f"{cb}.0.weight")
                blk[f"bn{ci}_s"] = _bn_from_torch(state, f"{cb}.1")
                blk[f"conv{ci}_t"] = _conv3d_from_torch(state, f"{cb}.3.weight")
                blk[f"bn{ci}"] = _bn_from_torch(state, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in state:
                blk["down_conv"] = _conv3d_from_torch(state, f"{base}.downsample.0.weight")
                blk["down_bn"] = _bn_from_torch(state, f"{base}.downsample.1")
            inplanes = planes
            layer.append(blk)
        p[f"layer{li + 1}"] = layer
    return p


def _conv2plus1d(blk, ci, x, stride):
    """Factorized (2+1)D conv: 1x3x3 spatial (stride (1,s,s)) -> bn -> relu ->
    3x1x1 temporal (stride (s,1,1))."""
    s = stride
    y = _c3d(blk[f"conv{ci}_s"], x, (1, s, s), (0, 1, 1))
    y = jax.nn.relu(_bn(blk[f"bn{ci}_s"], y))
    y = _c3d(blk[f"conv{ci}_t"], y, (s, 1, 1), (1, 0, 0))
    return y


def r2plus1d_18_features(params, clips):
    """clips: (B, T, H, W, 3) normalized (T=8, 112x112 in the script) ->
    (B, 512) spatio-temporally pooled features."""
    x = _c3d(params["stem_s"], clips, (1, 2, 2), (0, 3, 3))
    x = jax.nn.relu(_bn(params["stem_bn_s"], x))
    x = _c3d(params["stem_t"], x, (1, 1, 1), (1, 0, 0))
    x = jax.nn.relu(_bn(params["stem_bn_t"], x))
    for li in range(1, 5):
        for b, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and b == 0) else 1  # static (not traced)
            idn = x
            y = jax.nn.relu(_bn(blk["bn1"], _conv2plus1d(blk, 1, x, stride)))
            y = _bn(blk["bn2"], _conv2plus1d(blk, 2, y, 1))
            if "down_conv" in blk:
                idn = _bn(blk["down_bn"],
                          _c3d(blk["down_conv"], x, (stride,) * 3, (0, 0, 0)))
            x = jax.nn.relu(y + idn)
    return jnp.mean(x, axis=(1, 2, 3))
