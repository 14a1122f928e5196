"""Int8 dynamic-quantization path for the frozen towers (serving/eval).

Both backbones (Swin-V2-L, HTS-AT) are frozen in every DG-SCT task
(net_trans.py:846-848 sets requires_grad=False on the towers), so their fat
GEMMs can run on the v5e's int8 MXU path: measured through this tunnel
(perf/roofline.py) the model's fat GEMM shapes sustain ~206 TOPS int8 vs
~137 TF/s bf16 (1.5x). This module implements weight-static / activation-
dynamic symmetric int8:

  * weights: per-output-channel absmax scales, quantized ONCE at load
    (`quantize_linear`, `quantize_tree`);
  * activations: per-row absmax scales computed on the fly, so the dot is a
    true int8 x int8 -> int32 MXU op (`preferred_element_type=jnp.int32`);
  * the f32 rescale (row_scale x col_scale) + bias is a fused VPU epilogue.

`ops.basic.linear` dispatches on the presence of "kernel_q", so every call
site (qkv, proj, mlp fc1/fc2, ...) picks the path up without change. Only
matmuls with both dims large are worth it (skinny dims waste MXU tiles and
lose accuracy headroom): `quantize_tree` filters by min(in, out) >= 192.

Accuracy is bounded by tests/test_quant.py (logit agreement vs bf16).
Enable in bench/serving via BENCH_INT8=1 / serve --int8.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_linear_params(d) -> bool:
    return (isinstance(d, dict) and "kernel" in d
            and getattr(d["kernel"], "ndim", 0) == 2)


# models/adapter.py stage 1 (token_resample/chan_align) routes through
# ops.basic.linear via adapter._token_linear, so the whole adapter stack is
# walk-eligible; the only raw-kernel consumer left (the branch-B bias-reorder
# `wsum`) reads the dequantized view through adapter._kernel_f32.


def quantize_linear(p, *, sym_clip=127.0):
    """{"kernel": (I,O), "bias"?} -> {"kernel_q": int8, "kscale": f32 (O,), ...}."""
    w = jnp.asarray(p["kernel"], jnp.float32)
    kscale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / sym_clip  # (O,)
    wq = jnp.clip(jnp.round(w / kscale[None, :]), -sym_clip, sym_clip).astype(jnp.int8)
    out = {"kernel_q": wq, "kscale": kscale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def linear_int8(p, x):
    """Int8 linear: x (..., I) -> (..., O) on the int8 MXU.

    Two activation-scale modes:
      * static ("ascale" present, from `calibrate_ave`): quantize is a pure
        elementwise `clip(round(x * inv_s))` that XLA fuses into the
        producer's epilogue — the activation is materialized ONCE, in int8
        (half the bf16 bytes), and the absmax reduce disappears. This is the
        production path; measured: dynamic scales gave ZERO net win (the
        extra absmax+requant HBM passes ate the 1.5x GEMM gain).
      * dynamic (no "ascale"): per-row absmax at runtime — calibration-free
        but pays 2-3 extra passes over the activation.
    """
    xf = x.astype(jnp.float32)
    if "ascale" in p:
        # f32 cast guards against upstream mixed-precision param casts
        ascale = p["ascale"].astype(jnp.float32)  # static scalar (calibrated)
    else:
        ascale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / ascale), -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (ascale * p["kscale"].astype(jnp.float32))
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _walk_eligible(tree, visit, *, min_dim, skip_keys=()):
    """Depth-first walk; for every linear-like subdict (plain or already
    quantized) with min(kernel dims) >= min_dim, replace it with
    `visit(node, qid)`. qids are assigned in walk order — the SAME tree
    walked twice yields the same qid assignment, which is what ties
    calibration tags to quantized layers."""
    counter = [0]

    def go(node, key=None):
        if key in skip_keys:
            return node
        if isinstance(node, dict) and ("kernel" in node or "kernel_q" in node):
            k = node.get("kernel", node.get("kernel_q"))
            if getattr(k, "ndim", 0) == 2 and min(k.shape) >= min_dim:
                qid = counter[0]
                counter[0] += 1
                return visit(node, qid)
            return node
        if isinstance(node, dict):
            return {kk: go(v, kk) for kk, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(go(v) for v in node)
        return node

    return go(tree)


def quantize_tree(tree, *, min_dim=192, skip_keys=(), act_scales=None):
    """Recursively quantize every eligible linear subdict. With `act_scales`
    ({qid: activation absmax} from `calibrate_ave`), a static "ascale" is
    baked in so the runtime absmax reduce disappears."""
    def visit(node, qid):
        if "kernel_q" in node:  # already quantized: only refresh ascale
            q = dict(node)
        else:
            q = quantize_linear(node)
            q.update({k: v for k, v in node.items() if k not in ("kernel", "bias")})
        if act_scales is not None and qid in act_scales:
            q["ascale"] = jnp.float32(max(act_scales[qid], 1e-8) / 127.0)
        return q

    return _walk_eligible(tree, visit, min_dim=min_dim, skip_keys=skip_keys)


def qid_shape_map(tree, *, min_dim=192, skip_keys=()):
    """{qid: (in_dim, out_dim)} for every walk-eligible linear — the
    integrity fingerprint of a calibration-scale file. Any model edit that
    shifts the walk order (adds/removes/resizes an eligible linear) changes
    this map, so callers can detect a stale scale file instead of silently
    assigning scales to the wrong layers."""
    shapes = {}

    def visit(node, qid):
        k = node.get("kernel", node.get("kernel_q"))
        shapes[qid] = tuple(int(d) for d in k.shape)
        return node

    _walk_eligible(tree, visit, min_dim=min_dim, skip_keys=skip_keys)
    return shapes


def save_scales(path, scales, shapes):
    """Write a calibration-scale file with its qid->shape fingerprint."""
    import json
    with open(path, "w") as f:
        json.dump({"scales": {str(k): v for k, v in scales.items()},
                   "shapes": {str(k): list(v) for k, v in shapes.items()}},
                  f)


def load_scales(path, expect_shapes=None):
    """Read a calibration-scale file; returns {qid: absmax} or None if the
    file's fingerprint does not match `expect_shapes` (stale — the caller
    should recalibrate). Legacy flat {qid: absmax} files validate by qid
    count only."""
    import json
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, dict) and "scales" in raw:
        if expect_shapes is not None:
            got = {int(k): tuple(v) for k, v in raw["shapes"].items()}
            if got != dict(expect_shapes):
                return None
        return {int(k): v for k, v in raw["scales"].items()}
    if expect_shapes is not None and len(raw) != len(expect_shapes):
        return None
    return {int(k): v for k, v in raw.items()}


def attach_qtags(tree, *, min_dim=192, skip_keys=()):
    """Insert a "qtag" int32 leaf into every eligible linear (calibration)."""
    def visit(node, qid):
        t = dict(node)
        t["qtag"] = jnp.int32(qid)
        return t

    return _walk_eligible(tree, visit, min_dim=min_dim, skip_keys=skip_keys)


def calibrate_ave(params, state, cfg, wave, images, *,
                  towers=("swin", "htsat"), min_dim=192):
    """One-shot activation-scale calibration for the AVE eval forward.

    Tags every eligible tower linear, patches the module-level `linear`
    bindings with a recorder that emits (qtag, absmax(x)) as auxiliary jit
    outputs (trace-time collection), runs the forward on the given batch, and
    returns {qid: activation absmax}. Call per calibration batch and take the
    running max; feed into `quantize_eval_params(act_scales=...)`.

    `towers` may include "adapters": in serving EVERY weight is static, so the
    adapter stack's fat affines AND its stage-1 resample/align GEMMs (the
    largest bf16 residue, perf/bf16_residue.py) are int8-eligible. Adapter
    qids are appended after the tower qids (same walk order), so tower-only
    scale files stay valid prefixes."""
    from ..models import ave

    return _calibrate_forward(
        params, state,
        lambda t, s, w, im: ave.forward(t, s, w, im, cfg, train=False),
        (wave, images), towers=towers, min_dim=min_dim)


def calibrate_avs(params, state, cfg, wave, images, *,
                  towers=("swin", "htsat"), min_dim=192):
    """One-shot activation-scale calibration for the AVS eval forward (the
    second serving family — same recorder machinery as `calibrate_ave`;
    note the avs arg order: images before wave)."""
    from ..models import avs

    return _calibrate_forward(
        params, state,
        lambda t, s, w, im: avs.forward(t, s, im, w, cfg, train=False),
        (wave, images), towers=towers, min_dim=min_dim)


def calibrate_avvp(params, state, cfg, wave, images, video_st, *,
                   towers=("swin", "htsat"), min_dim=192):
    """One-shot activation-scale calibration for the AVVP eval forward."""
    from ..models import avvp

    return _calibrate_forward(
        params, state,
        lambda t, s, w, im, st: avvp.forward(t, s, w, im, st, cfg,
                                             train=False),
        (wave, images, video_st), towers=towers, min_dim=min_dim)


def calibrate_avqa(params, state, cfg, wave, images, question, *,
                   towers=("swin", "htsat"), min_dim=192):
    """One-shot activation-scale calibration for the AVQA eval forward (the
    training-only nega stream receives the posi frames — XLA CSEs it)."""
    from ..models import avqa

    return _calibrate_forward(
        params, state,
        lambda t, s, w, im, q: avqa.forward(t, s, w, im, im, q, cfg,
                                            train=False),
        (wave, images, question), towers=towers, min_dim=min_dim)


def _calibrate_forward(params, state, fwd, arrays, *, towers, min_dim):
    """Shared recorder: tag every eligible tower linear, patch the
    module-level `linear` bindings with a recorder that emits
    (qtag, absmax(x)) as trace-time auxiliary outputs, run `fwd(tagged,
    state, *arrays)` once, return {qid: activation absmax}."""
    import numpy as np

    from ..models import adapter as AD, htsat as H, swinv2 as S
    from . import basic, windows as W

    tagged = dict(params)
    # single walk over an ordered {tower: tree} dict keeps qids global
    sub = _ordered_towers(params, towers)
    tagged.update(attach_qtags(sub, min_dim=min_dim))

    recs = []
    orig = basic.linear

    def rec(p, x):
        if isinstance(p, dict) and "qtag" in p:
            recs.append((p["qtag"], jnp.max(jnp.abs(x.astype(jnp.float32)))))
            p = {k: v for k, v in p.items() if k != "qtag"}
        return orig(p, x)

    @jax.jit
    def run(tagged, state, *arrays):
        recs.clear()
        fwd(tagged, state, *arrays)
        tags = jnp.stack([t for t, _ in recs])
        ams = jnp.stack([a for _, a in recs])
        return tags, ams

    mods = (basic, W, H, S, AD)  # AD: adapter.py binds `linear` at import
    saved = [m.linear for m in mods]
    for m in mods:
        m.linear = rec
    try:
        tags, ams = run(tagged, state, *arrays)
        tags, ams = np.asarray(tags), np.asarray(ams)
    finally:
        for m, s in zip(mods, saved):
            m.linear = s
    scales = {}
    for t, a in zip(tags, ams):
        scales[int(t)] = max(scales.get(int(t), 0.0), float(a))
    return scales


def _ordered_towers(params, towers):
    return {t: params[t] for t in towers if t in params}


def quantize_eval_params(params, *, towers=("swin", "htsat"), min_dim=192,
                         act_scales=None):
    """Quantize the static weights of a full AVE param tree for eval/serving.

    Default covers the frozen towers. Pass towers=("swin", "htsat",
    "adapters") to also quantize the adapter stack — legitimate in serving
    where every weight is static: the fat affines plus the stage-1
    token_resample/chan_align GEMMs (via adapter._token_linear; accuracy is
    bounded by tests/test_quant.py). Heads stay fp: they are a negligible
    FLOP share (10-frame 512-d streams). cpb MLPs (2->512->heads) and other
    skinny linears are filtered out by min_dim. With `act_scales` from
    `calibrate_ave`, activations use static scales (the fast path)."""
    out = dict(params)
    out.update(quantize_tree(_ordered_towers(params, towers),
                             min_dim=min_dim, act_scales=act_scales))
    return out
