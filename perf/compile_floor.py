"""Remote-compile floor through the axon tunnel (VERDICT r2 #8).

Measures cold XLA compile time (persistent cache OFF) for programs of
increasing size, isolating where the bench's ~270-480 s cold forward compile
goes:

  * `rpc`     — trivial 1-element add: pure tunnel round-trip + backend floor
  * `gemm`    — one fat 1440x1440x5760 bf16 GEMM (the model's widest shape)
  * `block`   — one full Swin-V2 paired half-block (attention+MLP, ws=12)
  * `step`    — the complete AVE forward, single step (no streaming scan)
  * `scan`    — the bench's streaming lax.scan over M=4 steps (body == step)

Each program is traced over UNIQUE shapes/constants so the in-process and
persistent caches can't hit (cache dir is also pointed at a throwaway tmp).
`step`-vs-`scan` separates model-lowering cost from scan overhead; `block`
x #distinct-block-shapes bounds what program splitting could recover.

Run: timeout 3600 python perf/compile_floor.py    (serialize: 1-core host)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)  # off

out = {}


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    dt = time.perf_counter() - t0
    out[name] = round(dt, 1)
    print(f"# {name}: compile {dt:.1f} s", flush=True)
    return c


tpu = jax.devices()[0]

# 1. RPC floor — unique constant so nothing can cache
x = jax.device_put(jnp.float32(1.2345), tpu)
timed_compile("rpc_s", lambda v: v + 1.7182818, x)

# 2. one fat GEMM at the model's widest MLP shape
a = jax.device_put(jnp.ones((1440, 1440), jnp.bfloat16), tpu)
b = jax.device_put(jnp.ones((1440, 5760), jnp.bfloat16), tpu)
timed_compile("gemm_s", lambda a, b: (a @ b).sum(), a, b)

# 3. one paired Swin-V2 half-block at stage-2 geometry
from dg_sct_tpu.ops import windows as W
from dg_sct_tpu.ops.basic import layer_norm, mlp, mlp_init

dim, heads, ws, res = 384, 12, 12, (48, 48)
key = jax.random.PRNGKey(0)
ap = W.attention_v2_init(key, dim, heads)
mp = mlp_init(key, dim, 4 * dim)
ln = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
xb = jax.device_put(jnp.ones((2, res[0] * res[1], dim), jnp.bfloat16), tpu)


def one_block(x):
    def attn(xw, mask=None, nW=1):
        return W.window_attention_v2(ap, xw, num_heads=heads, ws=ws, mask=mask,
                                     nW=nW)
    y = x + W.shifted_window_attention(attn, layer_norm(ln, x),
                                       H=res[0], W=res[1], ws=ws, shift=0)
    return (y + mlp(mp, layer_norm(ln, y))).sum()


timed_compile("block_s", one_block, xb)

# 4. full AVE forward, ONE step (no streaming scan)
from dg_sct_tpu.configs import AVEModelConfig
from dg_sct_tpu.models import ave

cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, t)
    params, state = cast(params), cast(state)
params = jax.device_put(params, tpu)
state = jax.device_put(state, tpu)
B = 4
rs = np.random.RandomState(0)
cw = jax.device_put(jnp.asarray(
    (rs.randn(B, cfg.num_frames, cfg.htsat.frontend.clip_samples) * 0.1)
    .astype(np.float32)).astype(jnp.bfloat16), tpu)
ci = jax.device_put(jnp.asarray(
    rs.rand(B, cfg.num_frames, cfg.swin.img_size, cfg.swin.img_size, 3)
    .astype(np.float32)).astype(jnp.bfloat16), tpu)


def fwd_step(p, s, w, i):
    out, _ = ave.forward(p, s, w, i, cfg, train=False)
    return out["event_scores"]


timed_compile("step_s", fwd_step, params, state, cw, ci)

# 5. the bench's streaming scan, M=4 (body == the same step)
M = 4
cws = jnp.stack([cw + 0.001 * k for k in range(M)])
cis = jnp.stack([ci + 0.001 * k for k in range(M)])


def fwd_scan(p, s, ws_, is_):
    def body(carry, inp):
        w, i = inp
        return carry, fwd_step(p, s, w, i)
    _, outs = jax.lax.scan(body, 0, (ws_, is_))
    return outs


timed_compile("scan4_s", fwd_scan, params, state, cws, cis)

print(json.dumps(out))
