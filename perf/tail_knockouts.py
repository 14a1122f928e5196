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

VARIANTS = [
    (),                       # baseline
    ("softmax",),
    ("cosnorm",),
    ("biasadd",),
    ("roll",),
    ("gelu",),
    ("softmax", "cosnorm", "biasadd", "roll", "gelu"),  # everything off
]


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
