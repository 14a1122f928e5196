"""Component-level timing + cost analysis of the AVE forward on TPU."""
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
N = 80
rs = np.random.RandomState(0)

def timeit(f, args_list):
    _ = np.asarray(jax.tree_util.tree_leaves(f(*args_list[0]))[0])
    t0=time.perf_counter()
    outs=[f(*a) for a in args_list]
    _=[np.asarray(jax.tree_util.tree_leaves(o)[0]) for o in outs]
    return (time.perf_counter()-t0)/len(args_list)

M=6
imgs=[jnp.asarray(rs.rand(N,192,192,3).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]
waves=[jnp.asarray((rs.randn(N,32000)*0.1).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]

def report(name, f, a, args_list):
    jf = jax.jit(f)
    t = timeit(jf, args_list)
    ca = jf.lower(*a).compile().cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(json.dumps({"name": name, "s_per_call": round(t,4),
                      "flops_G": round(ca.get("flops",0)/1e9,1),
                      "bytes_GB": round(ca.get("bytes accessed",0)/1e9,2),
                      "hbm_GBps": round(ca.get("bytes accessed",0)/t/1e9,1)}), flush=True)

report("swin80", lambda x: S.forward_features(params["swin"], x, cfg.swin),
       (imgs[0],), [(i,) for i in imgs])

def htsat_fwd(w):
    toks, _ = H.frontend(params["htsat"], state["htsat"], w, cfg.htsat, train=False)
    plan = H.block_plan(cfg.htsat)
    x = toks
    for s_idx, stage in enumerate(plan):
        for d, meta in enumerate(stage):
            x = H.block(params["htsat"]["layers"][s_idx]["blocks"][d], x,
                        dim=meta["dim"], heads=meta["heads"], res=meta["res"],
                        ws=meta["ws"], shift=meta["shift"])
        if "downsample" in params["htsat"]["layers"][s_idx]:
            x = H.patch_merging(params["htsat"]["layers"][s_idx]["downsample"], x,
                                cfg.htsat.stage_resolution(s_idx))
    return x
report("htsat80", htsat_fwd, (waves[0],), [(w,) for w in waves])

def inter(w, im):
    feats, _ = I.forward(params, state, w, im, cfg, train=False)
    return feats["f_v"]
report("interleave80", inter, (waves[0], imgs[0]),
       [(w,i) for w,i in zip(waves,imgs)])
