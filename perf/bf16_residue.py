"""List the fat dot_generals still running in bf16 under the
int8_towers_adapters serving config, aggregated by shape signature — the
candidate list for widening int8 coverage.

Run: JAX_PLATFORMS=cpu python perf/bf16_residue.py
"""
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flop_mix import _DIMS, classify, conv_flops  # noqa: E402

_TENSOR_DT = re.compile(r"tensor<([0-9x]+)x([a-z0-9]+)>")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
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
    imgs = jnp.zeros((B, T, cfg.swin.img_size, cfg.swin.img_size, 3),
                     jnp.bfloat16)

    def fwd(p, state, wave, imgs):
        out, _ = ave.forward(p, state, wave, imgs, cfg, train=False)
        return out["event_scores"]

    qp = quant.quantize_eval_params(params,
                                    towers=("swin", "htsat", "adapters"))
    txt = jax.jit(fwd).lower(qp, state, wave, imgs).as_text()

    buckets = defaultdict(lambda: [0.0, 0])
    total = 0.0
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
            total += f
            dt = "i8" if ldt == "i8" and rdt == "i8" else "bf16"
            cls = classify(k, out, nbatch)
            if dt == "bf16" and cls == "fat":
                sig = f"{lsh}x{ldt} @ {rsh}x{rdt} -> {osh}"
                buckets[sig][0] += f
                buckets[sig][1] += 1
        elif "stablehlo.convolution" in line:
            f = conv_flops(line)
            total += f
            sig = "CONV " + line.strip()[:100]
            buckets[sig][0] += f
            buckets[sig][1] += 1

    rows = sorted(buckets.items(), key=lambda kv: -kv[1][0])
    print(f"total dot+conv TFLOP: {total/1e12:.3f}")
    for sig, (f, n) in rows[:25]:
        print(json.dumps({"sig": sig, "gflops": round(f / 1e9, 2),
                          "count": n, "pct": round(100 * f / total, 2)}))


if __name__ == "__main__":
    main()
