import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, json
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from dg_sct_tpu.configs import AVEModelConfig
from dg_sct_tpu.models import ave
from dg_sct_tpu.ops import dsp
from dg_sct_tpu.ops.basic import batch_norm, patch_embed

cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
fcfg = cfg.htsat.frontend
with jax.default_device(jax.devices("cpu")[0]):
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, t)
    params, state = cast(params), cast(state)
tpu = jax.devices()[0]
params = jax.device_put(params, tpu); state = jax.device_put(state, tpu)
N, M = 40, 16
rs = np.random.RandomState(0)
waves=[jnp.asarray((rs.randn(N,32000)*0.1).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]

def run(name, f, a_list):
    jf = jax.jit(f)
    _ = np.asarray(jf(*a_list[0]))
    t0=time.perf_counter()
    outs=[jf(*a) for a in a_list]
    outs=[np.asarray(o) for o in outs]
    print(json.dumps({"name": name, "step_ms": round((time.perf_counter()-t0)/M*1e3,1)}), flush=True)

run("pad_only", lambda w: jnp.pad(w.astype(jnp.float32), ((0,0),(512,512)), mode="reflect").sum(), [(w,) for w in waves])
run("power", lambda w: dsp.power_spectrogram(w, fcfg).sum(), [(w,) for w in waves])
run("power+logmel", lambda w: dsp.logmel(dsp.power_spectrogram(w, fcfg), fcfg).sum(), [(w,) for w in waves])

def thru_bn(p_, s_, w):
    x = dsp.logmel(dsp.power_spectrogram(w, fcfg), fcfg)
    x, _ = batch_norm(p_["htsat"]["bn0"], s_["htsat"]["bn0"], x, train=False, axis=-1)
    return x.sum()
run("power+logmel+bn0", thru_bn, [(params, state, w) for w in waves])

def thru_img(p_, s_, w):
    x = dsp.logmel(dsp.power_spectrogram(w, fcfg), fcfg)
    x, _ = batch_norm(p_["htsat"]["bn0"], s_["htsat"]["bn0"], x, train=False, axis=-1)
    img = dsp.reshape_wav2img(x, fcfg)
    return img.sum()
run("thru_wav2img", thru_img, [(params, state, w) for w in waves])

def thru_patch(p_, s_, w):
    x = dsp.logmel(dsp.power_spectrogram(w, fcfg), fcfg)
    x, _ = batch_norm(p_["htsat"]["bn0"], s_["htsat"]["bn0"], x, train=False, axis=-1)
    img = dsp.reshape_wav2img(x, fcfg).astype(p_["htsat"]["patch_embed"]["kernel"].dtype)
    return patch_embed(p_["htsat"]["patch_embed"], img, cfg.htsat.patch_size).sum()
run("thru_patch_embed", thru_patch, [(params, state, w) for w in waves])
