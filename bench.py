"""Benchmark: end-to-end 10-s AV clip pairs/sec on the flagship AVE model.

Measures three things on the attached TPU chip and prints ONE JSON line:
  * `value` (headline): eval-forward clip pairs/sec/chip of the best
    accuracy-bounded serving config (bf16, or int8 frozen towers — both
    reported raw; `serving_config` names the winner) with device-resident
    inputs (compute ceiling of the serving path);
  * `train_clips_per_sec`: full jitted training-step throughput (fwd + bwd +
    Adam update, rematerialized interleave);
  * `e2e_clips_per_sec`: host-pipeline mode — synthetic JPEG tree decoded by
    the native C++ IO core through `batched_iterator`, overlapping the device
    forward (what BASELINE.md means by "e2e");
  * `mfu_pct` / `mfu_vs_achievable_pct`: XLA cost-analysis FLOPs divided by
    the measured step time, against the nominal v5e peak (197 bf16 TFLOP/s)
    and the measured shape-mix ceiling respectively (see ACHIEVABLE_FLOPS).

Methodology notes (the tunnel runtime caches identical executions and
`block_until_ready` does not reliably fence): every timed call uses a DISTINCT
pre-staged device input and the full output is fetched to host inside the
timed region.

Baseline: 500 clip pairs/sec on v5e-8 (= 62.5/chip); vs_baseline is measured
per-chip eval throughput / 62.5.

Env knobs: BENCH_BATCH (4), BENCH_ITERS (32), BENCH_TRAIN=0/1 (1),
BENCH_E2E=0/1 (1), BENCH_PALLAS=0/1 (0), BENCH_INT8=0/1 (1; int8 frozen-tower
serving path, static scales cached in perf/bench_ascales.json),
BENCH_INT8_RECAL=0/1 (0), BENCH_INT8_ADAPTERS=0/1 (0; additionally quantize
the adapter stack's fat affines — static weights in serving; measured
opt-in), BENCH_INT8_ATTN=0/1 (0; int8 MXU attention core for
the quantized towers — opt-in until its compile cost is bounded),
BENCH_TRAIN_BATCH (4), BENCH_TRAIN_ITERS (8), BENCH_REMAT=none|full|dots
(none).
"""
from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

V5E_PEAK_FLOPS = 197e12   # bf16 nominal
# Measured big-matmul ceiling through this tunnel (perf/roofline.py, output
# properly fenced by fetching a scalar reduction — round-2's 85 TF/s was
# under-fenced): 114 TF/s bf16 = 58% of nominal; int8 168 TOPS. The model's
# matmul-only ceiling at its TRUE GEMM shapes/mix (perf/flop_mix.py: 3.7%
# skinny attention pairs @ 14 TF/s, 94% fat @ 137 TF/s) is ~103 TF/s.
# `mfu_vs_achievable_pct` is MFU against that shape-mix ceiling; `mfu_pct`
# stays against the nominal spec.
ACHIEVABLE_FLOPS = 103e12
# int8 serving config: fat GEMMs 206 TOPS / skinny attention pairs 18 TOPS
# (perf/roofline.py), conv share stays bf16 -> same shape-mix harmonic mean
# gives ~146 TF(model-flop)/s. Used only for the int8 run's
# mfu_vs_achievable_pct so the two configs are judged against their own
# ceilings.
ACHIEVABLE_FLOPS_INT8 = 146e12


def bench_forward(cfg, params, state, B, M, achievable=ACHIEVABLE_FLOPS):
    """Steady-state streaming throughput: all M steps run inside ONE jitted
    lax.scan over stacked (M, B, ...) inputs, so the tunnel's ~25 ms per-call
    dispatch RPC (measured with a pad-only probe; absent on directly-attached
    hardware) is paid once, not per step. Every step consumes a distinct
    input and all M outputs are fetched — nothing is skippable or cacheable."""
    import jax
    import jax.numpy as jnp
    from dg_sct_tpu.models import ave

    @jax.jit
    def fwd_stream(params, state, waves, imgs):
        def body(carry, wi):
            w, im = wi
            out, _ = ave.forward(params, state, w, im, cfg, train=False)
            return carry, out["event_scores"]

        _, outs = jax.lax.scan(body, 0, (waves, imgs))
        return outs

    rs = np.random.RandomState(0)
    T = cfg.num_frames
    reps = 3  # DISTINCT input stacks per rep: the tunnel caches identical runs
    stacks = []
    for _ in range(reps + 1):  # +1 warmup stack
        waves = jnp.asarray((rs.randn(M, B, T, cfg.htsat.frontend.clip_samples) * 0.1)
                            .astype(np.float32)).astype(jnp.bfloat16)
        imgs = jnp.asarray(rs.rand(M, B, T, cfg.swin.img_size, cfg.swin.img_size, 3)
                           .astype(np.float32)).astype(jnp.bfloat16)
        stacks.append((waves, imgs))
    jax.block_until_ready(stacks)
    t0 = time.perf_counter()
    _ = np.asarray(fwd_stream(params, state, *stacks[-1]))  # compile+warm
    bench_forward.compile_s = round(time.perf_counter() - t0, 1)

    # median-of-reps: the shared/virtualized chip shows +-8% run-to-run noise
    times = []
    for (w, i) in stacks[:reps]:
        t0 = time.perf_counter()
        out = np.asarray(fwd_stream(params, state, w, i))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(out).all()
    dt = sorted(times)[len(times) // 2]
    clips_per_sec = B * M / dt
    waves, imgs = stacks[0]

    # MFU from the STREAM executable's cost analysis: XLA counts a scan body
    # ONCE regardless of trip count, so the reported flops ~= one step's and
    # divide by dt/M. (Round 2 compiled a separate single-step program for
    # this — a whole extra ~2-4 min cold compile through the tunnel for a
    # number the stream program already carries.) `bytes accessed` is NOT
    # reported: XLA cost analysis counts logical bytes pre-fusion, which
    # overestimates real HBM traffic (round-2 recorded an impossible 117% —
    # see NOTES.md #2), so no HBM-utilization number is published.
    try:
        ca = fwd_stream.lower(params, state, *stacks[-1]).compile() \
            .cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        step_s = dt / M
        mfu = 100.0 * ca.get("flops", 0) / step_s / V5E_PEAK_FLOPS
        mfu_ach = 100.0 * ca.get("flops", 0) / step_s / achievable
    except Exception:  # some remote-compile runtimes reject the AOT re-lower
        mfu = mfu_ach = float("nan")
    return clips_per_sec, mfu, mfu_ach


def bench_train(B, M):
    """Training-step throughput at full size (f32 params, bf16 compute):
    M full steps (fwd + bwd + Adam) chained in one jitted lax.scan with the
    train state carried and DONATED — same streaming methodology as the
    forward bench. Remat policy via BENCH_REMAT=full|dots|none (default full;
    dots OOMs at this size — perf/remat_sweep.py records the sweep)."""
    import jax
    import jax.numpy as jnp
    from dg_sct_tpu.configs import AVEModelConfig, TrainConfig
    from dg_sct_tpu.data import ave as ave_data
    from dg_sct_tpu.models import ave, interleave
    from dg_sct_tpu.train import ave_train, losses
    import optax

    # Measured (perf/remat_sweep.py, B=4): none 11.3 > full 9.8 clips/s,
    # dots OOMs — storing activations beats recompute on this chip at this
    # size, so the bench default is "none" (training drivers default "full"
    # for headroom at larger batches).
    interleave.set_remat_policy(os.environ.get("BENCH_REMAT", "none"))
    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    tpu = jax.devices()[0]
    tr, fr = ave_train.partition_params(params)
    if os.environ.get("BENCH_TRAIN_FROZEN_BF16", "1") == "1":
        # frozen towers never see an optimizer: store them bf16 (halves their
        # weight traffic; the trainable tree stays f32 for Adam)
        fr = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, fr)
    tr, fr, state = (jax.device_put(t, tpu) for t in (tr, fr, state))
    tx = ave_train.make_optimizer(tr, TrainConfig(accum_steps=1), steps_per_epoch=100)
    opt_state = jax.device_put(tx.init(tr), tpu)

    stacked = {}
    for i in range(M):
        b = ave_data.synthetic_batch(B, seed=i)
        b["mixup_lambda"] = np.random.RandomState(i).beta(
            0.5, 0.5, size=(B * cfg.num_frames,)).astype(np.float32)
        for k, v in b.items():
            stacked.setdefault(k, []).append(v)
    stacked = {k: jax.device_put(jnp.asarray(np.stack(v)), tpu)
               for k, v in stacked.items()}
    rngs = jax.random.split(jax.random.PRNGKey(1), M)

    @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
    def train_stream(tr, fr, state, opt_state, batches, rngs):
        def body(carry, x):
            tr, state, opt_state = carry
            batch, rng = x

            def loss_fn(t, st):
                p = ave_train.merge_params(t, fr)
                out, new_state = ave.forward(p, st, batch["wave"], batch["image"],
                                             cfg, train=True, rng=rng,
                                             mixup_lambda=batch["mixup_lambda"])
                return losses.ave_loss(out, batch["gt"]), new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tr, state)
            updates, opt_state = tx.update(grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, new_state, opt_state), loss

        (tr, state, opt_state), ls = jax.lax.scan(
            body, (tr, state, opt_state), (batches, rngs))
        return tr, state, opt_state, ls

    t0 = time.perf_counter()
    tr, state, opt_state, ls = train_stream(tr, fr, state, opt_state,
                                            stacked, rngs)
    ls = np.asarray(ls)
    bench_train.compile_s = round(time.perf_counter() - t0, 1)
    assert np.isfinite(ls).all()
    t0 = time.perf_counter()
    tr, state, opt_state, ls = train_stream(
        tr, fr, state, opt_state, stacked,
        jax.random.split(jax.random.PRNGKey(2), M))
    ls = np.asarray(ls)
    dt = time.perf_counter() - t0
    assert np.isfinite(ls).all()

    # train MFU from the STREAM executable's cost analysis. XLA counts a
    # scan/while body ONCE regardless of trip count (same behavior the forward
    # bench works around), so the reported flops ~= one train step's flops and
    # divide by the per-step time dt/M. AOT re-lower hits the in-process
    # compile cache — no second tunnel compile.
    try:
        ca = train_stream.lower(tr, fr, state, opt_state, stacked, rngs) \
            .compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        bench_train.mfu_pct = round(
            100.0 * ca.get("flops", 0) / (dt / M) / V5E_PEAK_FLOPS, 2)
    except Exception:
        bench_train.mfu_pct = None
    return B * M / dt


def bench_e2e(cfg, params, state, B, M):
    """Host pipeline -> device: decode a synthetic JPEG tree via the native IO
    core + threaded batched_iterator, overlapping the device forward.

    Serving ingest path: DCT-scaled decode to uint8 on the host, ImageNet
    normalize fused on-device (`normalize_frames_u8`); wave ships as int16
    PCM (the container format of the source audio) and dequantizes on-device
    — the minimum host work and minimum bytes per clip (4.4 MB u8 frames +
    2.6 MB i16 wave per B=4 batch). Alongside the raw number the bench
    measures WHERE the cap is: `e2e_host_pipeline_clips_per_sec` (iterator
    only — the decode cap, ~30/s/core with the SIMD core) and
    `e2e_ingest_mb_per_sec` (timed device_put of the exact batch payload).
    Through this tunnel ingest runs at single-digit MB/s, which caps e2e far
    below both the decode rate and the device forward; on locally-attached
    TPU (PCIe, GB/s) the same path is decode-bound."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from dg_sct_tpu.data import ave as ave_data
    from dg_sct_tpu.models import ave
    from dg_sct_tpu.ops.basic import normalize_frames_u8

    @jax.jit
    def fwd(params, state, wave_i16, images_u8):
        images = normalize_frames_u8(images_u8)
        wave = wave_i16.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 32767.0)
        out, _ = ave.forward(params, state, wave, images, cfg, train=False)
        return out["event_scores"]

    def to_i16(wave):
        return (np.clip(wave, -1.0, 1.0) * 32767.0).astype(np.int16)

    tmp = tempfile.mkdtemp(prefix="dg_sct_bench_")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from media_tree import make_ave_tree
    n_videos = B * M
    cats = [f"c{i}" for i in range(4)]
    tree = make_ave_tree(tmp, [f"v{i:04d}" for i in range(n_videos)], cats,
                         n_frames=10, img_size=320,
                         wave_samples=10 * cfg.htsat.frontend.clip_samples)
    ds = ave_data.AVEDataset(tmp, "train", frame_dir=tree["frames"],
                             audio_dir=tree["audio"],
                             img_size=cfg.swin.img_size, raw_u8=True)

    # warm compile with one synthetic batch
    b0 = ave_data.synthetic_batch(B)
    imgs_u8 = (b0["image"] * 255).astype(np.uint8)
    _ = np.asarray(fwd(params, state, jnp.asarray(to_i16(b0["wave"])),
                       jnp.asarray(imgs_u8)))

    # host-pipeline cap: iterator-only pass (decode+resize+batch, no device)
    t0 = time.perf_counter()
    nh = sum(b["wave"].shape[0]
             for b in ave_data.batched_iterator(ds, B, shuffle=False,
                                                num_workers=8, prefetch=4))
    bench_e2e.host_pipeline_clips_per_sec = round(
        nh / (time.perf_counter() - t0), 2)

    # ingest bandwidth: timed device_put + fence of the exact batch payload
    pay_w = to_i16(b0["wave"])
    mb = (pay_w.nbytes + imgs_u8.nbytes) / 1e6
    ts = []
    for k in range(3):  # distinct payloads: the tunnel caches identical ops
        t0 = time.perf_counter()
        jax.block_until_ready((jax.device_put(pay_w + np.int16(k)),
                               jax.device_put(imgs_u8 + np.uint8(k))))
        ts.append(time.perf_counter() - t0)
    bench_e2e.ingest_mb_per_sec = round(mb / sorted(ts)[1], 2)

    n = 0
    pending = None
    t0 = time.perf_counter()
    for batch in ave_data.batched_iterator(ds, B, shuffle=False, num_workers=8,
                                           prefetch=4):
        out = fwd(params, state, jnp.asarray(to_i16(batch["wave"])),
                  jnp.asarray(batch["image"]))
        if pending is not None:  # overlap fetch with the next step's decode
            assert np.isfinite(np.asarray(pending)).all()
        pending = out
        n += batch["wave"].shape[0]
    assert np.isfinite(np.asarray(pending)).all()
    dt = time.perf_counter() - t0
    return n / dt


def main():
    import jax
    import jax.numpy as jnp

    from dg_sct_tpu.utils.compile_cache import enable_persistent_cache
    if "BENCH_CACHE_DIR" in os.environ:  # stable per-user dir otherwise
        os.environ["DG_SCT_CACHE_DIR"] = os.environ["BENCH_CACHE_DIR"]
    enable_persistent_cache()

    from dg_sct_tpu.configs import AVEModelConfig
    from dg_sct_tpu.models import ave
    from dg_sct_tpu.ops import windows as W

    if os.environ.get("BENCH_PALLAS", "0") == "1":
        W.set_pallas(True)
    if os.environ.get("BENCH_INT8_ATTN", "0") == "1":
        W.set_int8_attn(True)
    if os.environ.get("BENCH_FUSED", "0") == "1":
        W.set_fused_block(True)
    if os.environ.get("BENCH_SCAN", "0") == "1":  # measured slower; see interleave.py
        from dg_sct_tpu.models import interleave as I
        I.set_scan(True)

    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
        params, state = cast(params), cast(state)
    tpu = jax.devices()[0]
    params = jax.device_put(params, tpu)
    state = jax.device_put(state, tpu)

    # batch sweep on the tunnel'd chip: B=4/5 (57.7 clips/s) > B=6 (56.2)
    # > B=8 (53.5) > B=12 (50.7) > B=16 (43.2) — small batches keep the
    # working set VMEM-resident
    B = int(os.environ.get("BENCH_BATCH", "4"))
    M = int(os.environ.get("BENCH_ITERS", "32"))

    if os.environ.get("BENCH_FWD", "1") == "1":
        try:
            clips_per_sec, mfu, mfu_ach = bench_forward(cfg, params, state, B, M)
        except Exception:
            W.set_pallas(False)
            clips_per_sec, mfu, mfu_ach = bench_forward(cfg, params, state, B, M)
    else:
        clips_per_sec = mfu = mfu_ach = float("nan")
    fwd_compile_s = getattr(bench_forward, "compile_s", None)

    # int8 serving path: frozen towers on the v5e int8 MXU (ops/quant.py) with
    # STATIC calibrated activation scales (dynamic per-row scales measured a
    # zero net win — the absmax/requant HBM passes eat the 1.5x GEMM gain).
    # Scales for the bench's deterministic seed-0 params are cached in
    # perf/bench_ascales.json (committed) so a fresh machine skips the ~5 min
    # calibration compile; BENCH_INT8_RECAL=1 regenerates it.
    int8_variants = []  # (name, towers, scale_file)
    if os.environ.get("BENCH_INT8", "1") == "1":
        int8_variants.append(
            ("int8_frozen_towers", ("swin", "htsat"), "bench_ascales.json"))
    if os.environ.get("BENCH_INT8_ADAPTERS", "0") == "1":
        # serving config: adapters are static weights too (ops/quant.py)
        int8_variants.append(
            ("int8_towers_adapters", ("swin", "htsat", "adapters"),
             "bench_ascales_adapters.json"))
    int8_res = {}  # name -> (clips, mfu, mfu_ach)
    for name, towers, sname in int8_variants:
        try:
            from dg_sct_tpu.ops import quant
            sfile = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "perf", sname)
            scales = None
            if (os.path.exists(sfile)
                    and os.environ.get("BENCH_INT8_RECAL", "0") != "1"):
                with open(sfile) as f:
                    scales = {int(k): v for k, v in json.load(f).items()}
            if scales is None:
                rs = np.random.RandomState(7)
                cw = jnp.asarray((rs.randn(B, cfg.num_frames,
                                           cfg.htsat.frontend.clip_samples) * 0.1)
                                 .astype(np.float32)).astype(jnp.bfloat16)
                ci = jnp.asarray(rs.rand(B, cfg.num_frames, cfg.swin.img_size,
                                         cfg.swin.img_size, 3)
                                 .astype(np.float32)).astype(jnp.bfloat16)
                scales = quant.calibrate_ave(params, state, cfg, cw, ci,
                                             towers=towers)
                with open(sfile, "w") as f:
                    json.dump(scales, f)
            with jax.default_device(jax.devices("cpu")[0]):
                qparams = quant.quantize_eval_params(
                    jax.device_get(params), towers=towers, act_scales=scales)
            qparams = jax.device_put(qparams, tpu)
            int8_res[name] = bench_forward(
                cfg, qparams, state, B, M, achievable=ACHIEVABLE_FLOPS_INT8)
            del qparams
        except Exception as e:
            print(f"# {name} bench failed: {type(e).__name__}: {e}", flush=True)
    int8_clips, int8_mfu, int8_mfu_ach = int8_res.get(
        "int8_frozen_towers", (float("nan"),) * 3)

    import math
    # headline = the best accuracy-bounded serving config (int8 variants when
    # they win — tests/test_quant.py bounds their logit drift); all configs
    # are reported raw alongside.
    best, best_cfg = clips_per_sec, "bf16"
    best_mfu, best_mfu_ach = mfu, mfu_ach
    for name, (c, m_, ma) in int8_res.items():
        if c == c and c > best:
            best, best_cfg, best_mfu, best_mfu_ach = c, name, m_, ma
    result = {
        "metric": "ave_clip_pairs_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "clip/s",
        "vs_baseline": round(best / (500.0 / 8.0), 3),
        "serving_config": best_cfg,
        "mfu_pct": round(best_mfu, 2),
        "mfu_vs_achievable_pct": round(best_mfu_ach, 2),
        # the measured matmul-only ceiling of the winning config's shape mix
        # (perf/roofline.py true-shape rates x perf/flop_mix.py flop shares),
        # expressed as nominal MFU — the max mfu_pct this program could show
        # with zero non-matmul time on this tunnel'd chip
        "mfu_ceiling_pct": round(100.0 * (
            ACHIEVABLE_FLOPS_INT8 if best_cfg.startswith("int8")
            else ACHIEVABLE_FLOPS) / V5E_PEAK_FLOPS, 1),
        "compile_s": fwd_compile_s,
        "bf16_clips_per_sec": round(clips_per_sec, 2),
        "int8_clips_per_sec": round(int8_clips, 2),
    }
    if "int8_towers_adapters" in int8_res:
        result["int8_adapters_clips_per_sec"] = round(
            int8_res["int8_towers_adapters"][0], 2)
    result = {k: v for k, v in result.items()
              if not (isinstance(v, float) and math.isnan(v))}
    if os.environ.get("BENCH_E2E", "1") == "1":
        try:
            result["e2e_clips_per_sec"] = round(
                bench_e2e(cfg, params, state, B, max(M // 2, 2)), 2)
            # where the cap is (see bench_e2e docstring): decode rate and
            # tunnel ingest bandwidth, measured in the same run
            result["e2e_host_pipeline_clips_per_sec"] = getattr(
                bench_e2e, "host_pipeline_clips_per_sec", None)
            result["e2e_ingest_mb_per_sec"] = getattr(
                bench_e2e, "ingest_mb_per_sec", None)
            result["host_cores"] = os.cpu_count()
        except Exception as e:
            result["e2e_error"] = f"{type(e).__name__}: {e}"[:120]
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            result["train_clips_per_sec"] = round(
                bench_train(int(os.environ.get("BENCH_TRAIN_BATCH", "4")),
                            int(os.environ.get("BENCH_TRAIN_ITERS", "8"))), 2)
            result["train_compile_s"] = getattr(bench_train, "compile_s", None)
            if getattr(bench_train, "mfu_pct", None) is not None:
                result["train_mfu_pct"] = bench_train.mfu_pct
        except Exception as e:
            result["train_error"] = f"{type(e).__name__}: {e}"[:120]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
