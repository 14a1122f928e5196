import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, json
jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")

# matmul peak: chain of 8192^3 bf16 matmuls
N = 8192
rs = np.random.RandomState(0)
A = [jnp.asarray(rs.randn(N, N).astype(np.float32)).astype(jnp.bfloat16) for _ in range(4)]
W1 = jnp.asarray(rs.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)

@jax.jit
def mm(x):
    for _ in range(8):
        x = jnp.tanh(x @ W1)  # tanh breaks algebraic simplification
    return jnp.sum(x.astype(jnp.float32))

_ = np.asarray(mm(A[0]))
t0 = time.perf_counter()
for a in A: _ = np.asarray(mm(a))
dt = (time.perf_counter() - t0) / 4
fl = 8 * 2 * N**3
print(json.dumps({"matmul_tflops": round(fl/dt/1e12, 1), "per_call_ms": round(dt*1e3,1)}), flush=True)

# HBM bandwidth: big elementwise copy-scale
M = 256 * 1024 * 1024 // 2   # 256MB bf16
X = [jnp.asarray(rs.randn(M//4).astype(np.float32)).astype(jnp.bfloat16) for _ in range(4)]
@jax.jit
def ew(x):
    for _ in range(8):
        x = x * 1.0001 + 0.001
    return jnp.sum(x[:128].astype(jnp.float32))
_ = np.asarray(ew(X[0]))
t0 = time.perf_counter()
for x in X: _ = np.asarray(ew(x))
dt = (time.perf_counter() - t0) / 4
byt = 8 * 2 * X[0].size * 2  # read+write per pass
print(json.dumps({"hbm_GBps": round(byt/dt/1e9, 1)}), flush=True)

# medium matmul like our shapes: (184320, 192) @ (192, 576)
T, C, O = 184320, 192, 576
Xm = [jnp.asarray(rs.randn(T, C).astype(np.float32)).astype(jnp.bfloat16) for _ in range(4)]
Wm = jnp.asarray(rs.randn(C, O).astype(np.float32)).astype(jnp.bfloat16)
Wb = jnp.asarray(rs.randn(O, C).astype(np.float32)).astype(jnp.bfloat16)
@jax.jit
def mm2(x):
    for _ in range(8):
        x = jnp.tanh((x @ Wm) @ Wb)
    return jnp.sum(x.astype(jnp.float32))
_ = np.asarray(mm2(Xm[0]))
t0 = time.perf_counter()
for x in Xm: _ = np.asarray(mm2(x))
dt = (time.perf_counter() - t0) / 4
fl = 8 * 2 * 2 * T * C * O
print(json.dumps({"qkv_shape_tflops": round(fl/dt/1e12, 1), "per_call_ms": round(dt*1e3,1)}), flush=True)
