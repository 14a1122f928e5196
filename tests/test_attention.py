"""Window attention parity vs independent torch mirrors."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from dg_sct_tpu.ops import windows as W
from dg_sct_tpu.ops.basic import linear_init


def _np(key, *shape, scale=0.1):
    return np.asarray(jax.random.normal(key, shape)) * scale


def test_window_partition_reverse_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    wins = W.window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 3)
    back = W.window_reverse(wins, 4, 8, 8)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_matches_torch_semantics():
    """Cross-check against the view/permute formulation (htsat.py:20-31)."""
    x = np.random.RandomState(0).randn(2, 8, 8, 5).astype(np.float32)
    ws = 4
    t = torch.from_numpy(x)
    B, H, Wd, C = t.shape
    tv = t.view(B, H // ws, ws, Wd // ws, ws, C)
    ref = tv.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C).view(-1, ws * ws, C)
    ours = np.asarray(W.window_partition(jnp.asarray(x), ws))
    assert np.array_equal(ours, ref.numpy())


def test_relative_position_index_matches_torch():
    ws = 8
    coords = torch.stack(torch.meshgrid([torch.arange(ws), torch.arange(ws)], indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    ref = rel.sum(-1).numpy()
    assert np.array_equal(W.relative_position_index(ws, ws), ref)


def test_shift_mask_matches_torch():
    H = Wd = 16
    ws, shift = 8, 4
    img_mask = torch.zeros((1, H, Wd, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.view(1, H // ws, ws, Wd // ws, ws, 1).permute(0, 1, 3, 2, 4, 5)
    mw = mw.contiguous().view(-1, ws * ws)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0).numpy()
    assert np.array_equal(W.shift_attn_mask(H, Wd, ws, shift), am)


def _torch_attn_v1(x, qkv_w, qkv_b, proj_w, proj_b, table, num_heads, ws, mask=None):
    B_, N, C = x.shape
    hd = C // num_heads
    qkv = (x @ qkv_w.T + qkv_b).reshape(B_, N, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(W.relative_position_index(ws, ws).reshape(-1))
    bias = table[idx].reshape(N, N, -1).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, num_heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, N, N)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    return out @ proj_w.T + proj_b


def test_window_attention_v1_matches_torch():
    ws, heads, C = 8, 4, 96
    N = ws * ws
    rng = np.random.RandomState(3)
    x = rng.randn(6, N, C).astype(np.float32) * 0.1
    params = {
        "qkv": {"kernel": jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.05)},
        "proj": {"kernel": jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05),
                 "bias": jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)},
        "rpb_table": jnp.asarray(rng.randn((2 * ws - 1) ** 2, heads).astype(np.float32) * 0.05),
    }
    ours = np.asarray(W.window_attention_v1(params, jnp.asarray(x), num_heads=heads, ws=ws))
    ref = _torch_attn_v1(
        torch.from_numpy(x),
        torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T.copy()),
        torch.from_numpy(np.asarray(params["qkv"]["bias"])),
        torch.from_numpy(np.asarray(params["proj"]["kernel"]).T.copy()),
        torch.from_numpy(np.asarray(params["proj"]["bias"])),
        torch.from_numpy(np.asarray(params["rpb_table"])), heads, ws).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_window_attention_v1_shifted_mask():
    """Shifted windows: masked attention must equal per-region attention."""
    ws, heads, C, H = 4, 2, 8, 8
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, H * H, C).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(0)
    params = W.attention_v1_init(key, C, ws, heads)
    out = W.shifted_window_attention(
        lambda w, m, nw: W.window_attention_v1(params, w, num_heads=heads, ws=ws, mask=m, nW=nw),
        x, H=H, W=H, ws=ws, shift=2)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def _torch_attn_v2(x, p, num_heads, ws, mask=None):
    """Independent torch mirror of timm 0.6.12 swinv2 WindowAttention."""
    B_, N, C = x.shape
    hd = C // num_heads
    qkv_w = torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T.copy())
    q_bias = torch.from_numpy(np.asarray(p["q_bias"]))
    v_bias = torch.from_numpy(np.asarray(p["v_bias"]))
    qkv_bias = torch.cat((q_bias, torch.zeros_like(v_bias), v_bias))
    qkv = tF.linear(x, qkv_w, qkv_bias).reshape(B_, N, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = tF.normalize(q, dim=-1) @ tF.normalize(k, dim=-1).transpose(-2, -1)
    logit_scale = torch.clamp(
        torch.from_numpy(np.asarray(p["logit_scale"])),
        max=math.log(1.0 / 0.01)).exp()
    attn = attn * logit_scale
    table = torch.from_numpy(W.log_cpb_coords_table(ws, ws, 0))
    h1 = tF.relu(table @ torch.from_numpy(np.asarray(p["cpb_fc1"]["kernel"]))
                 + torch.from_numpy(np.asarray(p["cpb_fc1"]["bias"])))
    cpb = h1 @ torch.from_numpy(np.asarray(p["cpb_fc2"]["kernel"]))
    idx = torch.from_numpy(W.relative_position_index(ws, ws).reshape(-1))
    bias = cpb[idx].reshape(N, N, num_heads).permute(2, 0, 1)
    attn = attn + (16 * torch.sigmoid(bias)).unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, num_heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, num_heads, N, N)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    pw = torch.from_numpy(np.asarray(p["proj"]["kernel"]).T.copy())
    pb = torch.from_numpy(np.asarray(p["proj"]["bias"]))
    return out @ pw.T + pb


def test_window_attention_v2_matches_torch():
    ws, heads, C = 12, 6, 192
    N = ws * ws
    rng = np.random.RandomState(5)
    x = rng.randn(4, N, C).astype(np.float32) * 0.1
    params = W.attention_v2_init(jax.random.PRNGKey(1), C, heads)
    ours = np.asarray(W.window_attention_v2(
        params, jnp.asarray(x), num_heads=heads, ws=ws))
    ref = _torch_attn_v2(torch.from_numpy(x), params, heads, ws).numpy()
    assert np.max(np.abs(ours - ref)) < 2e-5
