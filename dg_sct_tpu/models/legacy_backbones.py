"""Dormant alternate backbones kept by the reference for ablations — JAX
rebuilds, interface parity only (zero live call sites; SURVEY.md §2.7):

  * ASTModel (audio spectrogram transformer) — few-shot/nets/ast_models.py
  * ModifiedResNet (CLIP's anti-aliased ResNet) — few-shot/nets/my_vit.py:18-158
  * AVENet (1-channel ResNet-18 VGGSound audio classifier)
        — pretrain/nets/Resnet_VGGSound.py

All NHWC, pure init/apply pairs, explicit BN state threading, torch-matching
explicit conv paddings (torch's pad=3 for a 7x7/2 stem is NOT XLA 'SAME')."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import (batch_norm, batch_norm_init, conv2d, conv2d_init,
                         layer_norm, layer_norm_init, linear, linear_init,
                         mlp, mlp_init, trunc_normal)
from ..ops.mha import mha, mha_init


# ---------------------------------------------------------------------------
# ASTModel (ast_models.py:36-223): DeiT-style ViT over mel spectrograms with
# cls + distillation tokens, overlapping 16x16 patches at (fstride, tstride)
# ---------------------------------------------------------------------------

def ast_grid(input_fdim, input_tdim, fstride, tstride):
    """Patch grid of the 16x16/(fs,ts) VALID conv (ast_models.py:182-188)."""
    return (input_fdim - 16) // fstride + 1, (input_tdim - 16) // tstride + 1


def adapt_pos_embed(pos_embed, old_hw, f_dim, t_dim):
    """DeiT 2-D pos-embed adaptation (ast_models.py:92-108): keep the two
    special tokens; centre-crop a grid axis when shrinking, bilinear-resize
    when growing."""
    D = pos_embed.shape[-1]
    special, grid = pos_embed[:2], pos_embed[2:]
    g = grid.reshape(old_hw, old_hw, D)
    if t_dim <= old_hw:
        s = old_hw // 2 - t_dim // 2
        g = g[:, s:s + t_dim]
    else:
        g = jax.image.resize(g, (old_hw, t_dim, D), "bilinear")
    if f_dim <= old_hw:
        s = old_hw // 2 - f_dim // 2
        g = g[s:s + f_dim]
    else:
        g = jax.image.resize(g, (f_dim, t_dim, D), "bilinear")
    return jnp.concatenate([special, g.reshape(f_dim * t_dim, D)], axis=0)


def init_ast(key, *, label_dim=527, fstride=10, tstride=10, input_fdim=128,
             input_tdim=1024, embed_dim=768, depth=12, num_heads=12,
             dtype=jnp.float32):
    f_dim, t_dim = ast_grid(input_fdim, input_tdim, fstride, tstride)
    n = f_dim * t_dim
    ks = jax.random.split(key, depth + 6)
    blocks = []
    for i in range(depth):
        kk = jax.random.split(ks[i], 2)
        blocks.append({"attn": mha_init(kk[0], embed_dim, dtype),
                       "mlp": mlp_init(kk[1], embed_dim, 4 * embed_dim, dtype=dtype),
                       "norm1": layer_norm_init(embed_dim, dtype),
                       "norm2": layer_norm_init(embed_dim, dtype)})
    return {"patch_proj": conv2d_init(ks[depth], 16, 16, 1, embed_dim, dtype=dtype),
            "cls_token": trunc_normal(ks[depth + 1], (1, embed_dim), dtype=dtype),
            "dist_token": trunc_normal(ks[depth + 2], (1, embed_dim), dtype=dtype),
            "pos_embed": trunc_normal(ks[depth + 3], (n + 2, embed_dim), dtype=dtype),
            "blocks": blocks,
            "norm": layer_norm_init(embed_dim, dtype),
            "mlp_head": {"norm": layer_norm_init(embed_dim, dtype),
                         "fc": linear_init(ks[depth + 4], embed_dim, label_dim,
                                           dtype=dtype)},
            "fstride": fstride, "tstride": tstride}


def ast_forward(params, x, *, num_heads=12, additional_patch=None,
                apply_head=False):
    """x: (B, time_frames, freq_bins) e.g. (12, 1024, 128) — ast_models.py:191.
    Returns the averaged (cls + dist) embedding (the reference leaves the
    mlp_head commented out, ast_models.py:222); `apply_head` applies it."""
    B = x.shape[0]
    spec = jnp.swapaxes(x, 1, 2)[..., None]              # (B, F, T, 1)
    fs, ts = params["fstride"], params["tstride"]
    patches = jax.lax.conv_general_dilated(
        spec, params["patch_proj"]["kernel"], (fs, ts), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["patch_proj"]["bias"]
    tok = patches.reshape(B, -1, patches.shape[-1])
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, tok.shape[-1]))
    dist = jnp.broadcast_to(params["dist_token"], (B, 1, tok.shape[-1]))
    h = jnp.concatenate([cls, dist, tok], axis=1) + params["pos_embed"]
    if additional_patch is not None:
        h = jnp.concatenate([h, additional_patch], axis=1)
    h = jnp.swapaxes(h, 0, 1)                            # time-major for mha
    for blk in params["blocks"]:
        hn = layer_norm(blk["norm1"], h)
        h = h + mha(blk["attn"], hn, hn, hn, num_heads=num_heads)
        h = h + mlp(blk["mlp"], layer_norm(blk["norm2"], h))
    h = jnp.swapaxes(h, 0, 1)
    h = layer_norm(params["norm"], h)
    out = (h[:, 0] + h[:, 1]) / 2.0
    if apply_head:
        out = linear(params["mlp_head"]["fc"],
                     layer_norm(params["mlp_head"]["norm"], out))
    return out


# ---------------------------------------------------------------------------
# ModifiedResNet (my_vit.py:18-158): CLIP's ResNet with 3-conv stem,
# anti-aliased downsampling, attention-pool head
# ---------------------------------------------------------------------------

def _avg_pool(x, k):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                                 (1, k, k, 1), "VALID") / (k * k)


def init_bottleneck(key, inplanes, planes, stride=1, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {"conv1": conv2d_init(ks[0], 1, 1, inplanes, planes, bias=False, dtype=dtype),
         "conv2": conv2d_init(ks[1], 3, 3, planes, planes, bias=False, dtype=dtype),
         "conv3": conv2d_init(ks[2], 1, 1, planes, planes * 4, bias=False, dtype=dtype),
         "stride": stride}
    st = {}
    for i, d in (("bn1", planes), ("bn2", planes), ("bn3", planes * 4)):
        p[i], st[i] = batch_norm_init(d, dtype)
    if stride > 1 or inplanes != planes * 4:
        p["down_conv"] = conv2d_init(ks[3], 1, 1, inplanes, planes * 4,
                                     bias=False, dtype=dtype)
        p["down_bn"], st["down_bn"] = batch_norm_init(planes * 4, dtype)
    return p, st


def bottleneck(p, st, x, *, train=False):
    new = {}
    out = conv2d(p["conv1"], x)
    out, new["bn1"] = batch_norm(p["bn1"], st["bn1"], out, train=train)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=[(1, 1), (1, 1)])
    out, new["bn2"] = batch_norm(p["bn2"], st["bn2"], out, train=train)
    out = jax.nn.relu(out)
    if p["stride"] > 1:
        out = _avg_pool(out, p["stride"])
    out = conv2d(p["conv3"], out)
    out, new["bn3"] = batch_norm(p["bn3"], st["bn3"], out, train=train)
    identity = x
    if "down_conv" in p:
        identity = x if p["stride"] == 1 else _avg_pool(x, p["stride"])
        identity = conv2d(p["down_conv"], identity)
        identity, new["down_bn"] = batch_norm(p["down_bn"], st["down_bn"],
                                              identity, train=train)
    return jax.nn.relu(out + identity), new


def init_attention_pool(key, spacial_dim, embed_dim, output_dim=None,
                        dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    out = output_dim or embed_dim
    return {"pos": jax.random.normal(ks[0], (spacial_dim ** 2 + 1, embed_dim),
                                     dtype) / embed_dim ** 0.5,
            "q": linear_init(ks[1], embed_dim, embed_dim, dtype=dtype),
            "k": linear_init(ks[2], embed_dim, embed_dim, dtype=dtype),
            "v": linear_init(ks[3], embed_dim, embed_dim, dtype=dtype),
            "c": linear_init(ks[4], embed_dim, out, dtype=dtype)}


def attention_pool(p, x, *, num_heads):
    """x: (B, H, W, C) -> (B, out). my_vit.py:74-98: prepend the mean token,
    attend the mean-query against all positions."""
    B, H, W, C = x.shape
    t = x.reshape(B, H * W, C)
    t = jnp.concatenate([jnp.mean(t, axis=1, keepdims=True), t], axis=1)
    t = t + p["pos"]
    d = C // num_heads

    def split(pp, z):
        return linear(pp, z).reshape(B, -1, num_heads, d).transpose(0, 2, 1, 3)

    q = split(p["q"], t[:, :1])
    k, v = split(p["k"], t), split(p["v"], t)
    attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d), -1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, C)
    return linear(p["c"], ctx)


def init_modified_resnet(key, layers=(3, 4, 6, 3), output_dim=1024, heads=32,
                         input_resolution=224, width=64, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = {"conv1": conv2d_init(ks[0], 3, 3, 3, width // 2, bias=False, dtype=dtype),
         "conv2": conv2d_init(ks[1], 3, 3, width // 2, width // 2, bias=False, dtype=dtype),
         "conv3": conv2d_init(ks[2], 3, 3, width // 2, width, bias=False, dtype=dtype)}
    st = {}
    for n, d in (("bn1", width // 2), ("bn2", width // 2), ("bn3", width)):
        p[n], st[n] = batch_norm_init(d, dtype)
    inplanes = width
    for li, (n_blocks, planes, stride) in enumerate(
            zip(layers, (width, width * 2, width * 4, width * 8),
                (1, 2, 2, 2))):
        blocks, bstates = [], []
        for b in range(n_blocks):
            bp, bs = init_bottleneck(jax.random.fold_in(ks[3], li * 100 + b),
                                     inplanes, planes,
                                     stride if b == 0 else 1, dtype)
            inplanes = planes * 4
            blocks.append(bp)
            bstates.append(bs)
        p[f"layer{li + 1}"] = blocks
        st[f"layer{li + 1}"] = bstates
    p["attnpool"] = init_attention_pool(ks[4], input_resolution // 32,
                                        width * 32, output_dim, dtype)
    p["heads"] = heads
    return p, st


def modified_resnet(p, st, x, *, train=False):
    """x: (B, H, W, 3) -> (B, output_dim)."""
    new = {}
    for i, (cn, bn, s) in enumerate((("conv1", "bn1", 2), ("conv2", "bn2", 1),
                                     ("conv3", "bn3", 1))):
        x = conv2d(p[cn], x, stride=s, padding=[(1, 1), (1, 1)])
        x, new[bn] = batch_norm(p[bn], st[bn], x, train=train)
        x = jax.nn.relu(x)
    x = _avg_pool(x, 2)
    for li in range(1, 5):
        new_blocks = []
        for bp, bs in zip(p[f"layer{li}"], st[f"layer{li}"]):
            x, nb = bottleneck(bp, bs, x, train=train)
            new_blocks.append(nb)
        new[f"layer{li}"] = new_blocks
    return attention_pool(p["attnpool"], x, num_heads=p["heads"]), new


# ---------------------------------------------------------------------------
# AVENet / 1-channel ResNet-18 (Resnet_VGGSound.py): VGGSound audio tagger
# ---------------------------------------------------------------------------

def init_basic_block(key, inplanes, planes, stride=1, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {"conv1": conv2d_init(ks[0], 3, 3, inplanes, planes, bias=False, dtype=dtype),
         "conv2": conv2d_init(ks[1], 3, 3, planes, planes, bias=False, dtype=dtype),
         "stride": stride}
    st = {}
    p["bn1"], st["bn1"] = batch_norm_init(planes, dtype)
    p["bn2"], st["bn2"] = batch_norm_init(planes, dtype)
    if stride != 1 or inplanes != planes:
        p["down_conv"] = conv2d_init(ks[2], 1, 1, inplanes, planes,
                                     bias=False, dtype=dtype)
        p["down_bn"], st["down_bn"] = batch_norm_init(planes, dtype)
    return p, st


def basic_block(p, st, x, *, train=False):
    new = {}
    out = conv2d(p["conv1"], x, stride=p["stride"], padding=[(1, 1), (1, 1)])
    out, new["bn1"] = batch_norm(p["bn1"], st["bn1"], out, train=train)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=[(1, 1), (1, 1)])
    out, new["bn2"] = batch_norm(p["bn2"], st["bn2"], out, train=train)
    identity = x
    if "down_conv" in p:
        identity = conv2d(p["down_conv"], x, stride=p["stride"])
        identity, new["down_bn"] = batch_norm(p["down_bn"], st["down_bn"],
                                              identity, train=train)
    return jax.nn.relu(out + identity), new


def init_avenet(key, num_classes=309, dtype=jnp.float32):
    """resnet18(num_classes=309, pool='avgpool') on 1-channel spectrograms
    (Resnet_VGGSound.py:8-16, 69-140)."""
    ks = jax.random.split(key, 6)
    p = {"conv1": conv2d_init(ks[0], 7, 7, 1, 64, bias=False, dtype=dtype)}
    st = {}
    p["bn1"], st["bn1"] = batch_norm_init(64, dtype)
    inplanes = 64
    for li, (planes, stride) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2))):
        blocks, bstates = [], []
        for b in range(2):
            bp, bs = init_basic_block(jax.random.fold_in(ks[1], li * 10 + b),
                                      inplanes, planes,
                                      stride if b == 0 else 1, dtype)
            inplanes = planes
            blocks.append(bp)
            bstates.append(bs)
        p[f"layer{li + 1}"] = blocks
        st[f"layer{li + 1}"] = bstates
    p["fc"] = linear_init(ks[2], 512, num_classes, dtype=dtype)
    return p, st


def avenet(p, st, audio, *, train=False):
    """audio: (B, F, T) or (B, F, T, 1) log-mel spectrogram -> (B, 309)."""
    x = audio if audio.ndim == 4 else audio[..., None]
    new = {}
    x = conv2d(p["conv1"], x, stride=2, padding=[(3, 3), (3, 3)])
    x, new["bn1"] = batch_norm(p["bn1"], st["bn1"], x, train=train)
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li in range(1, 5):
        new_blocks = []
        for bp, bs in zip(p[f"layer{li}"], st[f"layer{li}"]):
            x, nb = basic_block(bp, bs, x, train=train)
            new_blocks.append(nb)
        new[f"layer{li}"] = new_blocks
    x = jnp.mean(x, axis=(1, 2))
    return linear(p["fc"], x), new
