"""Measure the TRUE matmul flop mix of the bench forward (and train step).

The roofline argument needs the fraction of dot flops that run at the
skinny window-attention rate (~14 TF/s at true shapes, perf/roofline.py)
vs the fat-GEMM rate (~137 TF/s). Round 2 ASSUMED 55% skinny; this parses
the lowered StableHLO of the exact program bench.py runs and counts every
`dot_general`'s flops from its shapes, so the mix is measured, not guessed.

Classification: a dot is "skinny" (attention score/context shaped) when it
has batching dims and either contraction K <= 64 or both free dims <= 160
(window sizes are 49/64/144). Everything else (qkv/proj/MLP/patch/head
projections) is "fat".

Run on CPU (lowering only, no TPU needed):
  JAX_PLATFORMS=cpu python perf/flop_mix.py
"""
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TENSOR = re.compile(r"tensor<([0-9x]+)x[a-z0-9]+>")
_DIMS = re.compile(
    r"(?:batching_dims = \[([0-9, ]*)\] x \[([0-9, ]*)\], )?"
    r"contracting_dims = \[([0-9, ]*)\] x \[([0-9, ]*)\]")


def _shape(t):
    return [int(d) for d in t.split("x")] if t else []


def dot_flops(line):
    """(flops, lhs_shape, contracting_sizes, out_shape) for a dot_general."""
    m = _DIMS.search(line)
    tensors = _TENSOR.findall(line)
    if not m or len(tensors) < 3:
        return None
    lhs, _rhs, out = (_shape(t) for t in tensors[-3:])
    lcd = [int(x) for x in m.group(3).split(",") if x.strip()]
    k = int(np.prod([lhs[d] for d in lcd])) if lcd else 1
    g1 = m.group(1) or ""
    nbatch = len([x for x in g1.split(",") if x.strip()])
    return 2.0 * float(np.prod(out)) * k, lhs, k, out, nbatch


def classify(k, out, nbatch):
    free = out[nbatch:]
    if nbatch > 0 and (k <= 64 or all(f <= 160 for f in free)):
        return "skinny"
    return "fat"


def conv_flops(line):
    """stablehlo.convolution flops = 2 * prod(out) * K (in_ch * prod(kernel))."""
    tensors = _TENSOR.findall(line)
    if len(tensors) < 3:
        return 0.0
    lhs, rhs, out = (_shape(t) for t in tensors[-3:])
    # rhs is the kernel: flops = 2 * prod(out_spatial+batch+out_ch) * prod(rhs)/out_ch
    # prod(rhs) = kh*kw*cin*cout; out includes cout once.
    cout = out[-1] if out[-1] in rhs else max(set(rhs) & set(out), default=1)
    return 2.0 * float(np.prod(out)) * float(np.prod(rhs)) / max(cout, 1)


def analyze(lowered_text, label):
    buckets = defaultdict(float)
    top = defaultdict(float)
    for line in lowered_text.splitlines():
        if "stablehlo.dot_general" in line or ("dot_general" in line and "=" in line):
            r = dot_flops(line)
            if r is None:
                continue
            f, lhs, k, out, nb = r
            c = classify(k, out, nb)
            buckets[c] += f
            top[(c, tuple(out), k)] += f
        elif "stablehlo.convolution" in line:
            f = conv_flops(line)
            buckets["conv"] += f
            top[("conv", None, None)] += f
    total = sum(buckets.values())
    res = {
        "label": label,
        "dot_tflops": round(total / 1e12, 3),
        "skinny_pct": round(100 * buckets["skinny"] / total, 1),
        "fat_pct": round(100 * buckets["fat"] / total, 1),
        "conv_pct": round(100 * buckets["conv"] / total, 1),
    }
    tops = sorted(top.items(), key=lambda kv: -kv[1])[:8]
    res["top_shapes"] = [
        {"class": c, "out": list(o) if o else None, "k": k,
         "pct": round(100 * f / total, 1)}
        for (c, o, k), f in tops]
    return res


def main():
    import jax
    import jax.numpy as jnp
    from dg_sct_tpu.configs import AVEModelConfig
    from dg_sct_tpu.models import ave

    cfg = AVEModelConfig(compute_dtype=jnp.bfloat16)
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    params, state = cast(params), cast(state)
    B, T = 4, cfg.num_frames
    wave = jnp.zeros((B, T, cfg.htsat.frontend.clip_samples), jnp.bfloat16)
    imgs = jnp.zeros((B, T, cfg.swin.img_size, cfg.swin.img_size, 3), jnp.bfloat16)

    def fwd(params, state, wave, imgs):
        out, _ = ave.forward(params, state, wave, imgs, cfg, train=False)
        return out["event_scores"]

    txt = jax.jit(fwd).lower(params, state, wave, imgs).as_text()
    fres = analyze(txt, "forward_B4")
    print(json.dumps(fres))

    # weighted ceiling from perf/roofline.py measured rates
    RATES = {"skinny": 14.0e12, "fat": 136.7e12, "conv": 136.7e12}

    def ceiling_of(res):
        mix = {k: res[f"{k}_pct"] / 100.0 for k in ("skinny", "fat", "conv")}
        return 1.0 / sum(mix[k] / RATES[k] for k in mix)

    ceiling = ceiling_of(fres)
    print(json.dumps({
        "weighted_ceiling_tflops": round(ceiling / 1e12, 1),
        "ceiling_mfu_pct_nominal": round(100 * ceiling / 197e12, 1),
        "note": "ceiling assumes zero non-matmul time; rates from perf/roofline.py",
    }))

    # ---- train step (fwd + bwd + Adam): the backward HLO the verdict asked
    # for. Exactly bench.py's bench_train body (remat "none", frozen towers
    # bf16, trainable f32 Adam masters) at one step, lowered on CPU. ----
    if os.environ.get("FLOPMIX_TRAIN", "1") == "1":
        import optax
        from dg_sct_tpu.data import ave as ave_data
        from dg_sct_tpu.models import interleave
        from dg_sct_tpu.train import ave_train, losses

        interleave.set_remat_policy("none")
        cfg_t = AVEModelConfig(compute_dtype=jnp.bfloat16)
        params_t, state_t = ave.init_ave_model(jax.random.PRNGKey(0), cfg_t)
        tr, fr = ave_train.partition_params(params_t)
        fr = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, fr)
        from dg_sct_tpu.configs import TrainConfig
        tx = ave_train.make_optimizer(tr, TrainConfig(accum_steps=1),
                                      steps_per_epoch=100)
        opt_state = tx.init(tr)
        b = ave_data.synthetic_batch(B, seed=0)
        b["mixup_lambda"] = np.random.RandomState(0).beta(
            0.5, 0.5, size=(B * cfg_t.num_frames,)).astype(np.float32)
        b = {k: jnp.asarray(v) for k, v in b.items()}

        def train_step(tr, fr, state, opt_state, batch, rng):
            def loss_fn(t, st):
                p = ave_train.merge_params(t, fr)
                out, new_state = ave.forward(
                    p, st, batch["wave"], batch["image"], cfg_t, train=True,
                    rng=rng, mixup_lambda=batch["mixup_lambda"])
                return losses.ave_loss(out, batch["gt"]), new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tr, state)
            updates, opt_state = tx.update(grads, opt_state, tr)
            return optax.apply_updates(tr, updates), new_state, opt_state, loss

        ttxt = jax.jit(train_step).lower(
            tr, fr, state_t, opt_state, b, jax.random.PRNGKey(1)).as_text()
        tres = analyze(ttxt, "train_step_B4")
        print(json.dumps(tres))
        tceil = ceiling_of(tres)
        print(json.dumps({
            "train_weighted_ceiling_tflops": round(tceil / 1e12, 1),
            "train_ceiling_mfu_pct_nominal": round(100 * tceil / 197e12, 1),
            "bwd_over_fwd_dot_flops": round(
                tres["dot_tflops"] / fres["dot_tflops"], 2),
            "note": "train ceiling at the same measured rates; skinny share "
                    "rising vs forward means transposed/wgrad dots land in "
                    "the low-rate bucket",
        }))


if __name__ == "__main__":
    main()
