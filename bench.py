"""Benchmark: end-to-end 10-s AV clip pairs/sec on the flagship AVE model.

Runs the full eval forward (wave -> STFT -> log-mel -> dual-tower interleave
with 48 adapter calls -> heads) in bfloat16 on the attached TPU chip and
prints ONE JSON line. Baseline: 500 clip pairs/sec on v5e-8 (=62.5/chip);
vs_baseline is measured per-chip throughput / 62.5.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dg_sct_tpu.configs import AVEModelConfig
    from dg_sct_tpu.models import ave

    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params, state = ave.init_ave_model(rng, cfg)
    # bf16 weights: frozen towers are inference-only here, and bf16 halves HBM
    # traffic (the usual TPU bottleneck) while the MXU natively eats bf16.
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    params = cast(params)
    state = cast(state)

    B, T = 4, cfg.num_frames

    @jax.jit
    def fwd(params, state, wave, images):
        out, _ = ave.forward(params, state, wave, images, cfg, train=False)
        return out["event_scores"]

    rs = np.random.RandomState(0)
    wave = jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32)).astype(jnp.bfloat16)
    images = jnp.asarray(rs.rand(B, T, 192, 192, 3).astype(np.float32)).astype(jnp.bfloat16)

    # warmup/compile
    fwd(params, state, wave, images).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, state, wave, images)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    clips_per_sec = B * iters / dt
    baseline_per_chip = 500.0 / 8.0
    print(json.dumps({
        "metric": "ave_clip_pairs_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clip/s",
        "vs_baseline": round(clips_per_sec / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
