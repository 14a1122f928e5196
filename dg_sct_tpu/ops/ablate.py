"""Perf-instrumentation knockouts (trace-time, default empty).

`perf/tail_knockouts.py` uses these to attribute the forward's non-matmul
time (the gap between the measured step and the matmul-only roofline of
perf/flop_mix.py) by compiling variants with one elementwise/layout
subsystem removed. NEVER active in product paths: every flag defaults off
and only the perf harness sets them.

Flags: "softmax" (uniform-weight attention), "cosnorm" (plain scaled
dot-product instead of Swin-V2 scaled-cosine), "biasadd" (skip relative
position bias + shift mask adds), "roll" (no cyclic shift), "gelu" (relu),
"layernorm" (identity LN), "winlayout" (window partition/reverse without
the 6-d transpose — wrong grouping, same shapes), "adapters" (all 48
adapter calls return zero residuals + uniform maps), "heads" (skip
temporal_attn + CMBS, fabricate logits from tower means), "frontend"
(skip STFT/logmel/bn0/reshape — mel image from a broadcast wave mean).

Adapter stage-level flags (attribute the 13.3 ms adapter tail,
perf/results_r4/knockouts_int8.log, before fusing anything): "ad_stage1"
(prompts = broadcast mean of the other modality — skips the resample/align
GEMMs), "ad_stage2" (skip the latent-token two-hop attention), "ad_stage34"
(skip channel+spatial modulation; uniform sp_maps), "ad_stage5" (zero
residual — skips LN/bottleneck GEMMs/epilogue).
"""
ACTIVE: frozenset = frozenset()


def set_ablations(*names: str) -> None:
    global ACTIVE
    ACTIVE = frozenset(names)


def on(name: str) -> bool:
    return name in ACTIVE


def any_on() -> bool:
    return bool(ACTIVE)
