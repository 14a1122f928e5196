import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, json
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from dg_sct_tpu.configs import AVEModelConfig
from dg_sct_tpu.models import ave, interleave as I

cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, t)
    params, state = cast(params), cast(state)
tpu = jax.devices()[0]
params = jax.device_put(params, tpu); state = jax.device_put(state, tpu)
B, T = 4, 10
rs = np.random.RandomState(0)
M = 16
waves=[jnp.asarray((rs.randn(B,T,32000)*0.1).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]
imgs=[jnp.asarray(rs.rand(B,T,192,192,3).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]

def run(name, f):
    # params/state as ARGUMENTS, never closure constants: captured weights get
    # serialized into the HLO blob and blow the tunnel's remote-compile limit
    jf = jax.jit(f)
    _ = np.asarray(jf(params, state, waves[0], imgs[0]))
    t0=time.perf_counter()
    outs=[jf(params, state, w, i) for w, i in zip(waves, imgs)]
    outs=[np.asarray(o) for o in outs]
    dt=(time.perf_counter()-t0)/M
    print(json.dumps({"name": name, "step_ms": round(dt*1e3,1),
                      "clips_per_s": round(B/dt,1)}), flush=True)

def full(p_, s_, w, im):
    out, _ = ave.forward(p_, s_, w, im, cfg, train=False)
    return out["event_scores"]
run("full", full)

def towers_only(p_, s_, w, im):
    wf = w.reshape(B*T, -1); imf = im.reshape((B*T,)+im.shape[2:])
    feats, _ = I.forward(p_, s_, wf, imf, cfg, train=False)
    return feats["f_v"].sum() + feats["f_a"].sum()
run("towers_only", towers_only)
