"""MXU ceiling experiments (VERDICT r2 weak #2): is >=50% nominal MFU
reachable for this model on this chip, or is the ceiling lower — shown by
measurement, not prose?

Measures through the tunnel (distinct inputs per rep, outputs fetched):
  1. big bf16 matmul peak (the machine's practical ceiling);
  2. big int8 matmul peak (v5e doubles int8 MXU throughput on paper — both
     backbones are frozen, so int8 weights are a real option);
  3. the model's window-attention score/context GEMMs at their true shapes
     (B*nW batched 144x32 @ 32x144 per head) in bf16 and int8;
  4. the adapter/MLP fat GEMM shapes in bf16 and int8;
  5. the flop-weighted achievable MFU ceiling implied by (3)+(4) and the
     forward's measured flop mix.

Prints one JSON line with all measurements.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOMINAL = 197e12


def _fetch(x):
    # Through the tunnel block_until_ready does NOT fence (NOTES.md #5);
    # pulling a scalar reduction of the output to host is the only fence.
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x))


def timed_tf(fn, make_inputs, flops, reps=3):
    _fetch(fn(*make_inputs(0)))
    ts = []
    for r in range(1, reps + 1):
        inp = make_inputs(r)
        for x in inp:
            _fetch(x)
        t0 = time.perf_counter()
        _fetch(fn(*inp))
        ts.append(time.perf_counter() - t0)
    return flops / sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    out = {}

    # -- 1/2: big matmul peaks, bf16 vs int8 --------------------------------
    N = 8192
    ITERS = 8

    @jax.jit
    def big_bf16(a, b):
        def body(c, _):
            c = jnp.tanh(c @ b)  # tanh breaks algebraic folding across iters
            return c, ()
        c, _ = jax.lax.scan(body, a, (), length=ITERS)
        return c

    a = jnp.asarray(rs.randn(N, N), jnp.bfloat16) * 0.01

    def mk_bf16(r):
        return (a + r * 1e-3, jnp.asarray(rs.randn(N, N), jnp.bfloat16) * 0.01)

    out["big_bf16_tflops"] = round(
        timed_tf(big_bf16, mk_bf16, 2.0 * N * N * N * ITERS) / 1e12, 1)

    @jax.jit
    def big_int8(a8, b8):
        def body(c, _):
            y = jax.lax.dot(c, b8, preferred_element_type=jnp.int32)
            # renormalize to int8 range so the chain stays int8 x int8
            c = (y >> 12).astype(jnp.int8)
            return c, ()
        c, _ = jax.lax.scan(body, a8, (), length=ITERS)
        return c

    def mk_int8(r):
        rr = np.random.RandomState(r)
        return (jnp.asarray(rr.randint(-127, 127, (N, N)), jnp.int8),
                jnp.asarray(rr.randint(-127, 127, (N, N)), jnp.int8))

    try:
        out["big_int8_tops"] = round(
            timed_tf(big_int8, mk_int8, 2.0 * N * N * N * ITERS) / 1e12, 1)
    except Exception as e:
        out["big_int8_tops"] = f"unsupported: {type(e).__name__}"

    # -- 3: window-attention score GEMMs at true shapes ---------------------
    # AVE forward, stage with most flops: N=144 tokens/window, head dim 32,
    # qk matmul (144, 32) @ (32, 144) batched over B*nW*heads ~ 40*36*6
    BATCH, L, D = 40 * 36 * 6, 144, 32

    AITERS = 256  # 0.55 TFLOP/iter is latency-dominated at 8 iters

    @jax.jit
    def attn_shapes_bf16(q, k):
        # score (144x32 @ 32x144) + context (144x144 @ 144x32) — the model's
        # real pair; the context matmul consumes ALL of s, so XLA cannot
        # narrow the score GEMM (a slice here would overcount flops 4.5x)
        def body(c, _):
            s = jnp.einsum("bld,bmd->blm", q + c, k)
            c = jnp.tanh(jnp.einsum("blm,bmd->bld", s, k))
            return c, ()
        c, _ = jax.lax.scan(body, jnp.zeros_like(q), (), length=AITERS)
        return c

    def mk_attn(r):
        rr = np.random.RandomState(r)
        return (jnp.asarray(rr.randn(BATCH, L, D), jnp.bfloat16),
                jnp.asarray(rr.randn(BATCH, L, D), jnp.bfloat16))

    out["attn_score_bf16_tflops"] = round(
        timed_tf(attn_shapes_bf16, mk_attn,
                 2.0 * BATCH * L * L * D * 2 * AITERS) / 1e12, 1)

    # -- 4: adapter/MLP fat GEMMs (stage-2 shapes: tokens 36*40, 768->3072) --
    M, K, Nn = 36 * 40, 768, 3072

    FITERS = 1024  # 13.6 GFLOP/iter (fc1 + fc2)

    @jax.jit
    def fat_bf16(x, w, w2):
        # fc1 + fc2 round trip: a slice instead of w2 would let XLA narrow
        # the matmul and overcount flops 4x (seen: 290 "TF/s" > nominal)
        def body(c, _):
            c = jnp.tanh((c @ w) @ w2)
            return c, ()
        c, _ = jax.lax.scan(body, x, (), length=FITERS)
        return c

    def mk_fat(r):
        rr = np.random.RandomState(r)
        return (jnp.asarray(rr.randn(M, K), jnp.bfloat16),
                jnp.asarray(rr.randn(K, Nn), jnp.bfloat16),
                jnp.asarray(rr.randn(Nn, K), jnp.bfloat16) * 0.01)

    out["fat_gemm_bf16_tflops"] = round(
        timed_tf(fat_bf16, mk_fat, 2.0 * M * K * Nn * 2 * FITERS) / 1e12, 1)

    # int8 variants of (3) and (4): does int8 raise the small-shape rates?
    @jax.jit
    def attn_shapes_int8(q8, k8):
        def body(c, _):
            s = jax.lax.dot_general(
                jnp.clip(q8 + c, -127, 127).astype(jnp.int8), k8,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            s8 = (s >> 8).astype(jnp.int8)
            c = jax.lax.dot_general(
                s8, k8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            return c, ()
        c, _ = jax.lax.scan(
            body, jnp.zeros(q8.shape, jnp.int32), (), length=AITERS)
        return c

    def mk_attn8(r):
        rr = np.random.RandomState(r)
        return (jnp.asarray(rr.randint(-64, 64, (BATCH, L, D)), jnp.int8),
                jnp.asarray(rr.randint(-127, 127, (BATCH, L, D)), jnp.int8))

    try:
        out["attn_score_int8_tops"] = round(
            timed_tf(attn_shapes_int8, mk_attn8,
                     2.0 * BATCH * L * L * D * 2 * AITERS) / 1e12, 1)
    except Exception as e:
        out["attn_score_int8_tops"] = f"unsupported: {type(e).__name__}"

    @jax.jit
    def fat_int8(x8, w8, w28):
        def body(c, _):
            h = jax.lax.dot(c, w8, preferred_element_type=jnp.int32)
            h = (h >> 8).astype(jnp.int8)
            y = jax.lax.dot(h, w28, preferred_element_type=jnp.int32)
            c = (y >> 8).astype(jnp.int8)
            return c, ()
        c, _ = jax.lax.scan(body, x8, (), length=FITERS)
        return c

    def mk_fat8(r):
        rr = np.random.RandomState(r)
        return (jnp.asarray(rr.randint(-127, 127, (M, K)), jnp.int8),
                jnp.asarray(rr.randint(-127, 127, (K, Nn)), jnp.int8),
                jnp.asarray(rr.randint(-127, 127, (Nn, K)), jnp.int8))

    try:
        out["fat_gemm_int8_tops"] = round(
            timed_tf(fat_int8, mk_fat8,
                     2.0 * M * K * Nn * 2 * FITERS) / 1e12, 1)
    except Exception as e:
        out["fat_gemm_int8_tops"] = f"unsupported: {type(e).__name__}"

    # -- 5: implied ceiling --------------------------------------------------
    # Forward flop mix (from the compiled forward's cost analysis, NOTES.md):
    # ~55% attention-shaped skinny GEMMs, ~45% fat GEMMs (adapters/MLP/patch).
    f_skinny = 0.55
    skinny = out["attn_score_bf16_tflops"]
    fat = out["fat_gemm_bf16_tflops"]
    harmonic = 1.0 / (f_skinny / skinny + (1 - f_skinny) / fat)
    out["implied_ceiling_tflops"] = round(harmonic, 1)
    out["implied_ceiling_mfu_pct"] = round(100.0 * harmonic * 1e12 / NOMINAL, 1)
    out["note"] = ("implied ceiling assumes zero non-matmul time; measured "
                   "fwd sustains ~74% of the big-matmul rate (NOTES.md)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
