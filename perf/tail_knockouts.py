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
# KNOCKOUT_TRAIN=1 attributes the TRAIN step's tail instead (fwd+bwd+Adam;
# each variant is a fresh ~450 s train compile, so the default set is
# trimmed to the big structural suspects)
TRAIN_VARIANTS = [
    (),
    ("layernorm",),
    ("adapters",),
    ("heads",),
    ("softmax", "cosnorm", "biasadd", "roll", "gelu"),
]
if os.environ.get("KNOCKOUT_VARIANTS"):
    VARIANTS = TRAIN_VARIANTS = [tuple(x for x in v.split("+") if x)
                                 for v in os.environ["KNOCKOUT_VARIANTS"].split(",")]


def main_train():
    """Attribute the TRAIN step's tail (fwd+bwd+Adam at B=4, remat none,
    frozen-bf16 — the exact bench_train configuration)."""
    import functools
    import jax
    import jax.numpy as jnp
    import optax

    from dg_sct_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(min_compile_secs=1.0)  # host-fingerprinted dir

    from dg_sct_tpu.configs import AVEModelConfig, TrainConfig
    from dg_sct_tpu.models import ave, interleave
    from dg_sct_tpu.ops import ablate
    from dg_sct_tpu.train import ave_train, losses

    if os.environ.get("BENCH_GELU", "tanh") == "tanh":
        from dg_sct_tpu.ops import basic as _basic
        _basic.set_gelu_mode("tanh")   # match the bench train program

    interleave.set_remat_policy("none")
    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tpu = jax.devices()[0]
    tr0, fr = ave_train.partition_params(params)
    fr = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, fr)
    tr0, fr, state0 = (jax.device_put(t, tpu) for t in (tr0, fr, state))
    tx = ave_train.make_optimizer(tr0, TrainConfig(accum_steps=1),
                                  steps_per_epoch=100)
    opt0 = jax.device_put(tx.init(tr0), tpu)

    B, M = 4, 8
    # batches generated ON DEVICE (no ~180 MB tunnel staging) and fr passed
    # as an explicit jit ARGUMENT — closing over the frozen tree bakes it
    # into the compile request, which blows the remote-compile body limit
    # (r5: HTTP 413) on tunneled chips.
    T, S = cfg.num_frames, cfg.htsat.frontend.clip_samples
    from dg_sct_tpu.data.ave import NUM_CLASSES

    @jax.jit
    def gen_batches(k):
        kw, ki, kg, kl = jax.random.split(k, 4)
        cls = jax.random.randint(kg, (M, B), 0, NUM_CLASSES)
        gt = jax.nn.one_hot(jnp.repeat(cls[..., None], T, -1),
                            NUM_CLASSES + 1, dtype=jnp.float32)
        return {"wave": 0.1 * jax.random.normal(kw, (M, B, T, S), jnp.float32),
                "image": jax.random.uniform(ki, (M, B, T, cfg.swin.img_size,
                                                 cfg.swin.img_size, 3),
                                            jnp.float32),
                "gt": gt,
                "mixup_lambda": jax.random.beta(kl, 0.5, 0.5, (M, B * T))
                                .astype(jnp.float32)}

    stacked = gen_batches(jax.random.PRNGKey(11))

    base_ms = None
    for names in TRAIN_VARIANTS:
        ablate.set_ablations(*names)

        @jax.jit
        def train_stream(tr, fr, state, opt_state, batches, rngs):
            def body(carry, x):
                tr, state, opt_state = carry
                batch, rng = x

                def loss_fn(t, st):
                    p = ave_train.merge_params(
                        ave_train.cast_for_compute(t, cfg.compute_dtype), fr)
                    out, new_state = ave.forward(
                        p, st, batch["wave"], batch["image"], cfg, train=True,
                        rng=rng, mixup_lambda=batch["mixup_lambda"])
                    return losses.ave_loss(out, batch["gt"]), new_state

                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(tr, state)
                updates, opt_state = tx.update(grads, opt_state, tr)
                tr = optax.apply_updates(tr, updates)
                return (tr, new_state, opt_state), loss

            (tr, state, opt_state), ls = jax.lax.scan(
                body, (tr, state, opt_state), (batches, rngs))
            return ls

        t0 = time.perf_counter()
        _ = np.asarray(train_stream(tr0, fr, state0, opt0, stacked,
                                    jax.random.split(jax.random.PRNGKey(1), M)))
        compile_s = round(time.perf_counter() - t0, 1)
        times = []
        for seed in (2, 3):
            t0 = time.perf_counter()
            _ = np.asarray(train_stream(tr0, fr, state0, opt0, stacked,
                                        jax.random.split(jax.random.PRNGKey(seed), M)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        step_ms = dt / M * 1e3
        label = "+".join(names) if names else "baseline"
        if base_ms is None:
            base_ms = step_ms
        print(json.dumps({
            "train_knockout": label, "step_ms": round(step_ms, 1),
            "clips_per_s": round(B * M / dt, 1),
            "saved_ms_vs_base": round(base_ms - step_ms, 1),
            "compile_s": compile_s}), flush=True)
    ablate.set_ablations()


def main():
    import jax
    import jax.numpy as jnp

    from dg_sct_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache(min_compile_secs=1.0)  # host-fingerprinted dir

    from dg_sct_tpu.configs import AVEModelConfig
    from dg_sct_tpu.models import ave
    from dg_sct_tpu.ops import ablate

    if os.environ.get("BENCH_GELU", "tanh") == "tanh":
        from dg_sct_tpu.ops import basic as _basic
        _basic.set_gelu_mode("tanh")   # match the serving headline

    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
        if os.environ.get("BENCH_FOLD", "1") == "1":
            from dg_sct_tpu.models.interleave import fold_adapters_eval
            params, state = fold_adapters_eval(params, state, cfg)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
        params, state = cast(params), cast(state)
        if os.environ.get("KNOCKOUT_INT8", "0") == "1":
            # profile the int8 towers+adapters serving config (the headline)
            from dg_sct_tpu.ops import quant
            sfile = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_ascales_adapters.json")
            towers = ("swin", "htsat", "adapters")
            scales = quant.load_scales(
                sfile, quant.qid_shape_map(
                    quant._ordered_towers(params, towers)))
            assert scales is not None, f"stale scale file {sfile}: recalibrate"
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
    if os.environ.get("KNOCKOUT_TRAIN", "0") == "1":
        main_train()
    else:
        main()
