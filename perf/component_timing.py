import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, json
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from dg_sct_tpu.configs import AVEModelConfig
from dg_sct_tpu.models import ave, swinv2 as S, htsat as H, interleave as I

cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, t)
    params, state = cast(params), cast(state)
tpu = jax.devices()[0]
params = jax.device_put(params, tpu); state = jax.device_put(state, tpu)
N = 40  # B=4 x T=10 frames
rs = np.random.RandomState(0)
M = 16
imgs=[jnp.asarray(rs.rand(N,192,192,3).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]
waves=[jnp.asarray((rs.randn(N,32000)*0.1).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]

def run(name, f, a_list):
    jf = jax.jit(f)
    _ = np.asarray(jf(*a_list[0]))
    t0=time.perf_counter()
    outs=[jf(*a) for a in a_list]
    outs=[np.asarray(o) for o in outs]
    dt=(time.perf_counter()-t0)/M
    print(json.dumps({"name": name, "step_ms": round(dt*1e3,1)}), flush=True)

def swin_only(p_, im):
    return S.forward_features(p_["swin"], im, cfg.swin).sum()
run("swin40", swin_only, [(params, i) for i in imgs])

def htsat_only(p_, s_, w):
    toks, _ = H.frontend(p_["htsat"], s_["htsat"], w, cfg.htsat, train=False)
    x = toks
    for s_idx, stage in enumerate(H.block_plan(cfg.htsat)):
        for d, meta in enumerate(stage):
            x = H.block(p_["htsat"]["layers"][s_idx]["blocks"][d], x,
                        dim=meta["dim"], heads=meta["heads"], res=meta["res"],
                        ws=meta["ws"], shift=meta["shift"])
        if "downsample" in p_["htsat"]["layers"][s_idx]:
            x = H.patch_merging(p_["htsat"]["layers"][s_idx]["downsample"], x,
                                cfg.htsat.stage_resolution(s_idx))
    return x.sum()
run("htsat40", htsat_only, [(params, state, w) for w in waves])

def frontend_only(p_, s_, w):
    toks, _ = H.frontend(p_["htsat"], s_["htsat"], w, cfg.htsat, train=False)
    return toks.sum()
run("htsat_frontend40", frontend_only, [(params, state, w) for w in waves])

def htsat_stage0(p_, s_, w):
    toks, _ = H.frontend(p_["htsat"], s_["htsat"], w, cfg.htsat, train=False)
    x = toks
    stage = H.block_plan(cfg.htsat)[0]
    for d, meta in enumerate(stage):
        x = H.block(p_["htsat"]["layers"][0]["blocks"][d], x,
                    dim=meta["dim"], heads=meta["heads"], res=meta["res"],
                    ws=meta["ws"], shift=meta["shift"])
    return x.sum()
run("htsat_frontend+stage0", htsat_stage0, [(params, state, w) for w in waves])
