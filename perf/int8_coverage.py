"""Int8 matmul-FLOP coverage of the quantized serving program.

The int8 serving path (ops/quant.py) is worth exactly as much as the share of
fat-GEMM flops it actually converts: this lowers the REAL bench forward on CPU
(trace-only, no TPU needed) in three configs — bf16, int8 frozen towers, int8
towers+adapters — and buckets every `dot_general`'s flops by operand dtype and
shape class. A throughput projection from the measured tunnel rates
(perf/roofline.py: bf16 fat ~137 TF/s, int8 fat ~206 TOPS, skinny ~14 TF/s)
says how much of the remaining bf16 fat share is worth chasing.

Run: JAX_PLATFORMS=cpu python perf/int8_coverage.py
"""
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flop_mix import _DIMS, classify, conv_flops  # noqa: E402

_TENSOR_DT = re.compile(r"tensor<([0-9x]+)x([a-z0-9]+)>")

# measured through this tunnel at the model's true shapes (perf/roofline.py)
RATES = {
    ("fat", "bf16"): 136.7e12,
    ("fat", "i8"): 206.0e12,
    ("skinny", "bf16"): 14.0e12,
    ("skinny", "i8"): 18.0e12,
    ("conv", "bf16"): 136.7e12,
}


def analyze_dtype(txt, label):
    from collections import defaultdict
    buckets = defaultdict(float)
    for line in txt.splitlines():
        if "dot_general" in line and "=" in line:
            m = _DIMS.search(line)
            tensors = _TENSOR_DT.findall(line)
            if not m or len(tensors) < 3:
                continue
            (lsh, ldt), (rsh, rdt), (osh, odt) = tensors[-3:]
            out = [int(d) for d in osh.split("x")]
            lhs = [int(d) for d in lsh.split("x")]
            lcd = [int(x) for x in m.group(3).split(",") if x.strip()]
            k = int(np.prod([lhs[d] for d in lcd])) if lcd else 1
            g1 = m.group(1) or ""
            nbatch = len([x for x in g1.split(",") if x.strip()])
            f = 2.0 * float(np.prod(out)) * k
            dt = "i8" if ldt == "i8" and rdt == "i8" else "bf16"
            buckets[(classify(k, out, nbatch), dt)] += f
        elif "stablehlo.convolution" in line:
            buckets[("conv", "bf16")] += conv_flops(line)
    total = sum(buckets.values())
    tmodel = sum(f / RATES.get(c, 136.7e12) for c, f in buckets.items())
    res = {"label": label, "dot_tflops": round(total / 1e12, 3),
           "projected_matmul_ceiling_tflops": round(total / tmodel / 1e12, 1)}
    for (c, dt), f in sorted(buckets.items()):
        res[f"{c}_{dt}_pct"] = round(100 * f / total, 1)
    return res


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env alone
    import jax.numpy as jnp
    from dg_sct_tpu.configs import AVEModelConfig
    from dg_sct_tpu.models import ave
    from dg_sct_tpu.ops import quant

    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    params, state = cast(params), cast(state)
    B, T = 4, cfg.num_frames
    wave = jnp.zeros((B, T, cfg.htsat.frontend.clip_samples), jnp.bfloat16)
    imgs = jnp.zeros((B, T, cfg.swin.img_size, cfg.swin.img_size, 3), jnp.bfloat16)

    def lower(p, label):
        def fwd(p, state, wave, imgs):
            out, _ = ave.forward(p, state, wave, imgs, cfg, train=False)
            return out["event_scores"]
        txt = jax.jit(fwd).lower(p, state, wave, imgs).as_text()
        r = analyze_dtype(txt, label)
        print(json.dumps(r))
        return r

    lower(params, "bf16")
    lower(quant.quantize_eval_params(params), "int8_towers")
    lower(quant.quantize_eval_params(
        params, towers=("swin", "htsat", "adapters")), "int8_towers_adapters")


if __name__ == "__main__":
    main()
