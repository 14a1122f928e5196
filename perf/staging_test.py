import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, json
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")
N, M = 40, 16
rs = np.random.RandomState(0)

pad = jax.jit(lambda w: jnp.pad(w.astype(jnp.float32), ((0,0),(512,512)), mode="reflect").sum())
stage = jax.jit(lambda x: x * jnp.bfloat16(1.0))

def timeit(tag, arrs):
    _ = np.asarray(pad(arrs[0]))
    t0=time.perf_counter()
    outs=[pad(a) for a in arrs]
    outs=[np.asarray(o) for o in outs]
    print(json.dumps({tag: round((time.perf_counter()-t0)/M*1e3,2)}), flush=True)

# A: plain jnp.asarray staging (what bench does)
waves=[jnp.asarray((rs.randn(N,32000)*0.1).astype(np.float32)).astype(jnp.bfloat16) for _ in range(M)]
jax.block_until_ready(waves)
timeit("plain_asarray_ms", waves)

# B: arrays that are OUTPUTS of an on-device jitted op (device-resident if the
# runtime keeps results on device)
staged=[stage(w) for w in waves]
_=[np.asarray(s[0,0]) for s in staged]  # force each execution
timeit("jit_output_ms", staged)

# C: explicit device_put
tpu = jax.devices()[0]
put=[jax.device_put(np.asarray(w), tpu) for w in waves]
jax.block_until_ready(put)
timeit("device_put_ms", put)
