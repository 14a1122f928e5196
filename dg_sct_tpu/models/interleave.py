"""Interleaved dual-tower encoder: Swin-V2-L x HTS-AT in lockstep with DG-SCT
adapters between every paired block.

Rebuild of the hot loop at `DG-SCT/AVE/nets/net_trans.py:848-934` as a pure
function over explicit params — no private-attribute poking, traced once under
jit. Per paired block (net_trans.py:891-908):

    a_res, a_maps = adapter_a_p1(f_a, prompt=f_v)
    v_res, v_maps = adapter_v_p1(f_v, prompt=f_a)
    f_v = f_v + norm1(attn(f_v)) + v_res          # post-norm V2 half-block
    f_a = block_a(f_a) + a_res                    # full pre-norm V1 block
    a_res, a_maps = adapter_a_p2(f_a, prompt=f_v)
    v_res, v_maps = adapter_v_p2(f_v, prompt=f_a)
    f_v = f_v + norm2(mlp(f_v)) + v_res
    f_a = f_a + a_res

Unpaired visual blocks (stage 2 has 18 vs 6) run the plain V2 block; stage ends
downsample both towers. The LAST p2 spatial maps become each tower's pooling
weights (net_trans.py:922-924).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AdapterConfig, AVEModelConfig, ave_adapter_dims, ave_paired_layout
from . import adapter as A
from . import htsat as H
from . import swinv2 as S
from ..ops.basic import drop_path, layer_norm, mlp


# lax.scan over stage-2's repeated block groups. Measured on the v5e tunnel
# toolchain (perf/compile_time.py): the full-size single train step compiles
# in 363 s scanned vs 355 s unrolled (no win; XLA's unrolled pipeline is also
# slightly faster at runtime, and nesting the scan inside a streaming scan
# REGRESSES compile 988 vs 551 s) — so the default is OFF. The machinery is
# numerics-bit-matched (tests/test_interleave_scan.py) and available via
# set_scan(True) for deeper configs where trace size dominates.
SCAN_REPEATED_STAGES = False
SCAN_MIN_PAIRS = 2           # scan only when >= this many stacked iterations


def set_scan(enabled: bool, min_pairs: int = 2) -> None:
    global SCAN_REPEATED_STAGES, SCAN_MIN_PAIRS
    SCAN_REPEATED_STAGES = enabled
    SCAN_MIN_PAIRS = min_pairs


# Selective rematerialization policy for the per-block checkpoint under
# training (perf/remat_sweep.py measures the trade):
#   "full"  — recompute everything in backward (min HBM, max recompute FLOPs);
#   "dots"  — save matmul outputs, recompute elementwise/norms (measured:
#             OOMs at full size on the 16 GB v5e chip — the saved dot
#             outputs of 48 blocks x 40x3136-token stages exceed HBM);
#   "none"  — store all activations (max HBM, no recompute).
REMAT_POLICY = "full"


def set_remat_policy(policy: str) -> None:
    global REMAT_POLICY
    assert policy in ("full", "dots", "none")
    REMAT_POLICY = policy


def _remat(fn):
    if REMAT_POLICY == "none":
        return fn
    if REMAT_POLICY == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(fn)


# GPipe pipelining of the repeated stage-2 pair groups during EVAL forwards
# (parallel/pipeline.py): pairs become pipeline stages over the mesh's `pipe`
# axis and the (batch x frames) axis is streamed through in microbatches.
# Training still uses the unrolled/scanned paths (BN-state collection and
# per-block drop_path rng are batch-synchronous there).
PIPELINE_MESH = None
PIPELINE_MICRO = None        # microbatches; default = pipe-axis size


def set_pipeline(mesh, n_micro: int | None = None) -> None:
    """Enable (mesh) / disable (None) pipelined stage-2 eval. `mesh` must
    carry a `pipe` axis (parallel.pipeline.PIPE_AXIS) whose size divides the
    stage's pair count; batch*frames must divide n_micro."""
    global PIPELINE_MESH, PIPELINE_MICRO
    PIPELINE_MESH = mesh
    PIPELINE_MICRO = n_micro


ADKEYS = ("a_p1", "v_p1", "a_p2", "v_p2")


def _tree_stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _build_pair_stack(params, state, s_idx, pairs, vplan, aplan):
    """Stack the params/state of repeated pair-of-group blocks along a new
    leading n_pairs axis — shared layout for the lax.scan path and the GPipe
    path. Returns (stacked slots, per-position metas, k2)."""
    k2 = len(pairs[0])
    vblocks = params["swin"]["layers"][s_idx]["blocks"]
    ablocks = params["htsat"]["layers"][s_idx]["blocks"]
    stacked, metas = [], []
    for p in range(k2):
        entries = [pair[p] for pair in pairs]
        slot = {"v": _tree_stack([vblocks[vb] for vb, _, _ in entries]),
                "v_dpr": jnp.asarray([vplan[vb]["dpr"] for vb, _, _ in entries],
                                     jnp.float32)}
        if entries[0][2] is None:
            metas.append((vplan[entries[0][0]], None))
        else:
            slot["a"] = _tree_stack([ablocks[ab] for _, ab, _ in entries])
            slot["a_dpr"] = jnp.asarray([aplan[ab]["dpr"] for _, ab, _ in entries],
                                        jnp.float32)
            slot["ad"] = {kk: _tree_stack([params["adapters"][kk][ai]
                                           for _, _, ai in entries])
                          for kk in ADKEYS}
            slot["ast"] = {kk: _tree_stack([state["adapters"][kk][ai]
                                            for _, _, ai in entries])
                           for kk in ADKEYS}
            metas.append((vplan[entries[0][0]], aplan[entries[0][1]]))
        stacked.append(slot)
    return stacked, metas, k2


def _detect_scan_pairs(stage, vplan, aplan):
    """Split a stage layout into PAIRS of repeated `(k-1 plain + 1 paired)`
    groups whose static metas (shift/dims/window) are identical across pairs
    — stage 2's `[None,None,b0]*6` pattern (net_trans.py:885). Pairing (not
    single groups) is required because window-shift parity alternates group
    to group. Returns a list of per-pair entry lists, or None."""
    groups, cur = [], []
    for e in stage:
        cur.append(e)
        if e[2] is not None:
            groups.append(cur)
            cur = []
    if cur or len(groups) < 2 or len(groups) % 2:
        return None
    k = len(groups[0])
    if any(len(g) != k for g in groups):
        return None
    pairs = [groups[i] + groups[i + 1] for i in range(0, len(groups), 2)]
    if len(pairs) < SCAN_MIN_PAIRS:
        return None

    def meta_eq(m1, m2):
        return all(m1[kk] == m2[kk] for kk in m1 if kk != "dpr")

    for p in range(2 * k):
        ref_v = vplan[pairs[0][p][0]]
        for pair in pairs[1:]:
            if not meta_eq(vplan[pair[p][0]], ref_v):
                return None
        if pairs[0][p][2] is not None:
            ref_a = aplan[pairs[0][p][1]]
            for pair in pairs[1:]:
                if not meta_eq(aplan[pair[p][1]], ref_a):
                    return None
    return pairs


def init_adapters(key, cfg: AVEModelConfig, dtype=jnp.float32):
    """4 x 12 adapters (audio/vis x p1/p2), mirroring the ModuleLists at
    net_trans.py:807-845. Returns (params, state)."""
    dims = ave_adapter_dims(cfg.swin, cfg.htsat)
    # AVQA-style configs carry a distinct visual-adapter config (the reference
    # hardcodes use_gate=True on the visual ModuleLists, net_avst.py:402,412)
    vis_cfg = getattr(cfg, "adapter_vis", None) or cfg.adapter
    params = {k: [] for k in ("a_p1", "v_p1", "a_p2", "v_p2")}
    state = {k: [] for k in ("a_p1", "v_p1", "a_p2", "v_p2")}
    keys = jax.random.split(key, 4 * len(dims))
    ki = 0
    for (v_dim, v_tok, a_dim, a_tok) in dims:
        for name in ("a_p1", "a_p2"):
            p, s = A.init_adapter(keys[ki], dim=a_dim, other_dim=v_dim,
                                  num_tokens_self=a_tok, num_tokens_other=v_tok,
                                  cfg=cfg.adapter, dtype=dtype)
            params[name].append(p)
            state[name].append(s)
            ki += 1
        for name in ("v_p1", "v_p2"):
            p, s = A.init_adapter(keys[ki], dim=v_dim, other_dim=a_dim,
                                  num_tokens_self=v_tok, num_tokens_other=a_tok,
                                  cfg=vis_cfg, dtype=dtype)
            params[name].append(p)
            state[name].append(s)
            ki += 1
    return params, state


def fold_adapters_eval(params, state, cfg):
    """Serving-time transform: `adapter.fold_eval` over all four ModuleLists
    (BN affines folded into the bottleneck kernels, scalar gates into
    ln_post).  Exact in eval; use on a model's (params, state) before jit."""
    acfg = cfg.adapter
    vis_cfg = getattr(cfg, "adapter_vis", None) or cfg.adapter
    p, s = dict(params), dict(state)
    newp = {k: [] for k in ADKEYS}
    news = {k: [] for k in ADKEYS}
    for k in ADKEYS:
        c = acfg if k.startswith("a_") else vis_cfg
        for ap, ast in zip(params["adapters"][k], state["adapters"][k]):
            fp, fs = A.fold_eval(ap, ast, c)
            newp[k].append(fp)
            news[k].append(fs)
    p["adapters"] = newp
    s["adapters"] = news
    return p, s


def forward(params, state, wave, images, cfg: AVEModelConfig, *, train=False,
            rng=None, mixup_lambda=None, return_stage_taps=False):
    """wave: (N, L) flattened clips; images: (N, H, W, 3) flattened frames.

    Returns dict with pooled features f_v (N,1,1536), f_a (N,1,768) and new
    state. N = batch * num_frames. With `return_stage_taps`, also returns the
    per-stage visual token maps (AVS multi-scale taps, PVT_AVSModel.py:850-854;
    the final tap is swin.norm-ed, earlier ones raw).
    """
    rngs = {}
    if rng is not None:
        for i, name in enumerate(("frontend", "towers")):
            rngs[name] = jax.random.fold_in(rng, i)

    f_v = S.patch_embed_tokens(params["swin"], images, cfg.swin)
    f_a, new_frontend_state = H.frontend(
        params["htsat"], state["htsat"], wave, cfg.htsat, train=train,
        rng=rngs.get("frontend"), mixup_lambda=mixup_lambda)

    vis_plan = S.block_plan(cfg.swin)
    aud_plan = H.block_plan(cfg.htsat)
    layout = ave_paired_layout(cfg.swin, cfg.htsat)

    new_adapter_state = {k: [dict(s) for s in state["adapters"][k]]
                         for k in state["adapters"]}
    acfg = cfg.adapter
    acfg_v = getattr(cfg, "adapter_vis", None) or cfg.adapter
    v_maps = a_maps = None
    stage_taps = []

    def paired_step_impl(blk_params, blk_state, f_v, f_a, blk_rng, vmeta, ameta,
                         v_dpr=None, a_dpr=None):
        """One paired interleave step (net_trans.py:891-908) — rematerialized
        under training so backward recomputes instead of storing the per-block
        activations (HBM is the binding constraint on-chip).

        Stochastic depth matches the reference during training: the visual
        attn/mlp residuals pass through `drop_path1/2` (net_trans.py:894,903;
        swin dpr linearly spaced to 0.2) and the HTS-AT block applies its own
        (htsat.py:237-246, dpr to 0.1). Adapter residuals are NOT drop-pathed,
        exactly as in the reference."""
        vparams, aparams, ad = blk_params
        v_dpr = vmeta["dpr"] if v_dpr is None else v_dpr
        a_dpr = ameta["dpr"] if a_dpr is None else a_dpr
        new_st = {}
        a_res, _, new_st["a_p1"] = A.adapter(ad["a_p1"], blk_state["a_p1"],
                                             f_a, f_v, acfg, train=train)
        v_res, _, new_st["v_p1"] = A.adapter(ad["v_p1"], blk_state["v_p1"],
                                             f_v, f_a, acfg_v, train=train)
        v_dp_zero = isinstance(v_dpr, (int, float)) and v_dpr == 0.0
        dp_on = train and blk_rng is not None and not v_dp_zero
        r1 = r2 = ra = None
        if train and blk_rng is not None:
            r1, r2, ra = jax.random.split(blk_rng, 3)
        from ..ops.windows import fused_block_eligible, fused_half_block
        if fused_block_eligible(vmeta["dim"], vmeta["heads"], train):
            f_v = fused_half_block(vparams, f_v, kind="v2",
                                   heads=vmeta["heads"], res=vmeta["res"],
                                   ws=vmeta["ws"], shift=vmeta["shift"],
                                   pretrained_ws=vmeta["pretrained_ws"]) + v_res
        else:
            v_attn = layer_norm(vparams["norm1"], S.attn_part(vparams, f_v, vmeta))
            if dp_on:
                v_attn = drop_path(r1, v_attn, v_dpr, train)
            f_v = f_v + v_attn + v_res
        f_a = H.block(aparams, f_a, dim=ameta["dim"], heads=ameta["heads"],
                      res=ameta["res"], ws=ameta["ws"], shift=ameta["shift"],
                      drop_path_rate=a_dpr, train=train, rng=ra)
        f_a = f_a + a_res
        a_res, a_maps, new_st["a_p2"] = A.adapter(ad["a_p2"], blk_state["a_p2"],
                                                  f_a, f_v, acfg, train=train)
        v_res, v_maps, new_st["v_p2"] = A.adapter(ad["v_p2"], blk_state["v_p2"],
                                                  f_v, f_a, acfg_v, train=train)
        v_mlp = layer_norm(vparams["norm2"], mlp(vparams["mlp"], f_v))
        if dp_on:
            v_mlp = drop_path(r2, v_mlp, v_dpr, train)
        f_v = f_v + v_mlp + v_res
        f_a = f_a + a_res
        return f_v, f_a, a_maps, v_maps, new_st

    # meta dicts are static Python structure — close over them per block and
    # checkpoint only the array-pytree signature
    def make_paired(vmeta, ameta):
        fn = lambda bp, bs, fv, fa, br: paired_step_impl(bp, bs, fv, fa, br,
                                                         vmeta, ameta)
        return _remat(fn) if train else fn

    def make_plain(vmeta):
        fn = lambda vp, fv, br: S.block(vp, fv, vmeta, train=train, rng=br)
        return _remat(fn) if train else fn

    tower_rng = rngs.get("towers") if train else None
    blk_counter = 0

    def next_rng():
        nonlocal blk_counter
        blk_counter += 1
        if tower_rng is None:
            return None
        return jax.random.fold_in(tower_rng, blk_counter)

    def run_stage_scanned(s_idx, pairs, f_v, f_a, base_counter):
        """lax.scan over stacked pair-of-group params: one trace of the pair
        body instead of `n_pairs` unrolled copies (stage-2 compile time)."""
        nonlocal a_maps, v_maps
        k2 = len(pairs[0])
        n_pairs = len(pairs)
        stacked, metas, _ = _build_pair_stack(params, state, s_idx, pairs,
                                              vis_plan[s_idx], aud_plan[s_idx])

        def body(carry, xs_t):
            f_v, f_a = carry
            j, st = xs_t
            maps = None
            new_states = []
            for p in range(k2):
                vmeta, ameta = metas[p]
                m = base_counter + j * k2 + p + 1
                brng = (None if tower_rng is None
                        else jax.random.fold_in(tower_rng, m))
                sp = st[p]
                if ameta is None:
                    f_v = S.block(sp["v"], f_v, vmeta, train=train, rng=brng,
                                  dpr=sp["v_dpr"])
                else:
                    blk_params = (sp["v"], sp["a"], sp["ad"])
                    f_v, f_a, am, vm, new_st = paired_step_impl(
                        blk_params, sp["ast"], f_v, f_a, brng, vmeta, ameta,
                        v_dpr=sp["v_dpr"], a_dpr=sp["a_dpr"])
                    new_states.append(new_st)
                    maps = (am, vm)
            return (f_v, f_a), (tuple(new_states), maps)

        body_fn = _remat(body) if train else body
        xs = (jnp.arange(n_pairs), stacked)
        (f_v, f_a), (st_states, st_maps) = jax.lax.scan(body_fn, (f_v, f_a), xs)

        # unstack the scanned BN states back into the flat adapter lists
        paired_positions = [p for p in range(k2) if metas[p][1] is not None]
        for pos_i, p in enumerate(paired_positions):
            for j in range(n_pairs):
                ai = pairs[j][p][2]
                for kk in ADKEYS:
                    new_adapter_state[kk][ai] = jax.tree_util.tree_map(
                        lambda x, j=j: x[j], st_states[pos_i][kk])
        a_maps = jax.tree_util.tree_map(lambda x: x[-1], st_maps[0])
        v_maps = jax.tree_util.tree_map(lambda x: x[-1], st_maps[1])
        return f_v, f_a

    def run_stage_pipelined(s_idx, pairs, f_v, f_a):
        """GPipe the repeated pairs over PIPELINE_MESH's pipe axis (eval
        only): each pair is a pipeline stage, the (batch x frames) axis
        streams through in microbatches, last-pair spatial maps ride the
        carry so pooling weights come out per-sample."""
        nonlocal a_maps, v_maps
        from ..parallel import pipeline as PPL
        stacked, metas, k2 = _build_pair_stack(params, state, s_idx, pairs,
                                               vis_plan[s_idx], aud_plan[s_idx])
        n_micro = PIPELINE_MICRO or PIPELINE_MESH.shape[PPL.PIPE_AXIS]
        n = f_v.shape[0]
        if n % n_micro:
            raise ValueError(f"batch*frames={n} not divisible by "
                             f"n_micro={n_micro}")
        mb = n // n_micro
        split = lambda x: x.reshape((n_micro, mb) + x.shape[1:])
        mbs = (split(f_v), split(f_a),
               jnp.zeros((n_micro, mb, 1, f_a.shape[1]), f_a.dtype),
               jnp.zeros((n_micro, mb, 1, f_v.shape[1]), f_v.dtype))

        def pair_body(st, carry):
            fv, fa, am, vm = carry
            for p in range(k2):
                vmeta, ameta = metas[p]
                sp = st[p]
                if ameta is None:
                    fv = S.block(sp["v"], fv, vmeta, train=False)
                else:
                    fv, fa, am, vm, _ = paired_step_impl(
                        (sp["v"], sp["a"], sp["ad"]), sp["ast"], fv, fa, None,
                        vmeta, ameta, v_dpr=sp["v_dpr"], a_dpr=sp["a_dpr"])
            return (fv, fa, am, vm)

        f_v, f_a, am, vm = PPL.gpipe(pair_body, stacked, mbs, PIPELINE_MESH)
        merge = lambda x: x.reshape((n,) + x.shape[2:])
        a_maps, v_maps = merge(am), merge(vm)
        return merge(f_v), merge(f_a)

    for s_idx, stage in enumerate(layout):
        if PIPELINE_MESH is not None and not train:
            from ..parallel import pipeline as PPL
            ppairs = _detect_scan_pairs(stage, vis_plan[s_idx], aud_plan[s_idx])
            if (ppairs is not None
                    and len(ppairs) % PIPELINE_MESH.shape[PPL.PIPE_AXIS] == 0):
                blk_counter += len(ppairs) * len(ppairs[0])
                f_v, f_a = run_stage_pipelined(s_idx, ppairs, f_v, f_a)
                stage = []
        pairs = (_detect_scan_pairs(stage, vis_plan[s_idx], aud_plan[s_idx])
                 if SCAN_REPEATED_STAGES and stage else None)
        if pairs is not None:
            base = blk_counter
            blk_counter += len(pairs) * len(pairs[0])
            f_v, f_a = run_stage_scanned(s_idx, pairs, f_v, f_a, base)
            stage = []
        for (vb, ab, ai) in stage:
            vparams = params["swin"]["layers"][s_idx]["blocks"][vb]
            vmeta = vis_plan[s_idx][vb]
            if ai is None:
                f_v = make_plain(vmeta)(vparams, f_v, next_rng())
                continue
            aparams = params["htsat"]["layers"][s_idx]["blocks"][ab]
            ameta = aud_plan[s_idx][ab]
            blk_params = (vparams, aparams,
                          {k: params["adapters"][k][ai] for k in ADKEYS})
            blk_state = {k: state["adapters"][k][ai] for k in ADKEYS}
            f_v, f_a, a_maps, v_maps, new_st = make_paired(vmeta, ameta)(
                blk_params, blk_state, f_v, f_a, next_rng())
            for k in new_st:
                new_adapter_state[k][ai] = new_st[k]

        if return_stage_taps:
            is_last = s_idx == len(layout) - 1
            stage_taps.append(layer_norm(params["swin"]["norm"], f_v) if is_last else f_v)

        if "downsample" in params["swin"]["layers"][s_idx]:
            f_v = S.patch_merging(params["swin"]["layers"][s_idx]["downsample"],
                                  f_v, cfg.swin.stage_resolution(s_idx))
        if "downsample" in params["htsat"]["layers"][s_idx]:
            f_a = H.patch_merging(params["htsat"]["layers"][s_idx]["downsample"],
                                  f_a, cfg.htsat.stage_resolution(s_idx))

    f_v = layer_norm(params["swin"]["norm"], f_v)
    vis_tokens = f_v                                 # (N, 36, 1536) full grid

    # spatial-attention pooling with the last p2 maps (net_trans.py:922-924)
    f_v = jnp.einsum("bon,bnc->boc", v_maps, f_v)   # (N, 1, 1536)
    f_a = jnp.einsum("bon,bnc->boc", a_maps, f_a)   # (N, 1, 768)

    new_state = {"htsat": new_frontend_state, "adapters": new_adapter_state}
    out = {"f_v": f_v, "f_a": f_a, "vis_tokens": vis_tokens}
    if return_stage_taps:
        out["stage_taps"] = stage_taps
    return out, new_state
