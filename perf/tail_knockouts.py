"""Attribute the forward's non-matmul tail by compiled knockout variants.

perf/flop_mix.py puts the matmul-only ceiling at ~103 TF/s; the measured
forward sustains ~62 TF/s — i.e. ~26 ms of a 64 ms B=4 step is NOT GEMM
time. This compiles the exact streaming forward with one elementwise/layout
subsystem removed at a time (dg_sct_tpu.ops.ablate flags) and times each,
so the tail is attributed by measurement. Numerics of knockouts are wrong
on purpose — timing only.

Run serialized (1-core host: any concurrent job contaminates timings).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Round-3 measured (bf16, B=4 M=16, baseline 64.9 ms): softmax -5.3,
# cosnorm -1.0, biasadd -0.9, roll -0.7, gelu -0.2, all-five -8.4 ms.
# Round 4 attributes the REMAINING ~24 ms with structural knockouts
# (ops/ablate.py): layernorm, window-layout transposes, the whole adapter
# stack, the temporal/CMBS heads (incl. the sequential bi-LSTM), and the
# DSP frontend. KNOCKOUT_INT8=1 profiles the int8 serving config (the
# headline) instead of bf16. KNOCKOUT_VARIANTS=name1+name2,name3 overrides.
VARIANTS = [
    (),                       # baseline
    ("layernorm",),
    ("winlayout",),
    ("adapters",),
    ("heads",),
    ("frontend",),
    ("softmax", "cosnorm", "biasadd", "roll", "gelu"),  # r3 elementwise combo
]
if os.environ.get("KNOCKOUT_VARIANTS"):
    VARIANTS = [tuple(x for x in v.split("+") if x)
                for v in os.environ["KNOCKOUT_VARIANTS"].split(",")]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dg_sct_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dg_sct_tpu.configs import AVEModelConfig
    from dg_sct_tpu.models import ave
    from dg_sct_tpu.ops import ablate

    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
        params, state = cast(params), cast(state)
        if os.environ.get("KNOCKOUT_INT8", "0") == "1":
            # profile the int8 towers+adapters serving config (the headline)
            import json as _json
            from dg_sct_tpu.ops import quant
            sfile = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_ascales_adapters.json")
            with open(sfile) as f:
                scales = {int(k): v for k, v in _json.load(f).items()}
            params = quant.quantize_eval_params(
                params, towers=("swin", "htsat", "adapters"),
                act_scales=scales)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)

    B, M = 4, 16
    T = cfg.num_frames
    rs = np.random.RandomState(0)
    stacks = []
    for _ in range(3):
        waves = jnp.asarray((rs.randn(M, B, T, cfg.htsat.frontend.clip_samples) * 0.1)
                            .astype(np.float32)).astype(jnp.bfloat16)
        imgs = jnp.asarray(rs.rand(M, B, T, cfg.swin.img_size, cfg.swin.img_size, 3)
                           .astype(np.float32)).astype(jnp.bfloat16)
        stacks.append((waves, imgs))

    base_ms = None
    for names in VARIANTS:
        ablate.set_ablations(*names)

        @jax.jit
        def fwd_stream(params, state, waves, imgs):
            def body(carry, wi):
                w, im = wi
                out, _ = ave.forward(params, state, w, im, cfg, train=False)
                return carry, out["event_scores"]
            _, outs = jax.lax.scan(body, 0, (waves, imgs))
            return outs

        t0 = time.perf_counter()
        _ = np.asarray(fwd_stream(params, state, *stacks[-1]))
        compile_s = round(time.perf_counter() - t0, 1)
        times = []
        for (w, i) in stacks[:2]:
            t0 = time.perf_counter()
            out = np.asarray(fwd_stream(params, state, w, i))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        step_ms = dt / M * 1e3
        label = "+".join(names) if names else "baseline"
        if base_ms is None:
            base_ms = step_ms
        print(json.dumps({
            "knockout": label, "step_ms": round(step_ms, 1),
            "clips_per_s": round(B * M / dt, 1),
            "saved_ms_vs_base": round(base_ms - step_ms, 1),
            "compile_s": compile_s}), flush=True)
    ablate.set_ablations()


if __name__ == "__main__":
    main()
