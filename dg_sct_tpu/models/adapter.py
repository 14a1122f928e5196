"""DG-SCT cross-modal prompt adapter.

TPU-native rebuild of `VisualAdapter` (`DG-SCT/AVE/nets/net_trans.py:433-674`).
The reference shuttles tokens through (B, C, N, 1) Conv2d layouts; here
everything stays in the natural (B, N, C) token layout and every 1x1 conv is a
matmul, so the whole adapter is a chain of MXU matmuls + VPU elementwise ops
XLA can fuse.

Forward stages (net_trans.py:552-674):
  1. resample the other modality's tokens to this tower's (N, C) geometry
     (`conv_adapter` over the token axis + `fc` over channels);
  2. latent-token two-hop cross attention: prompts<-other, x<-prompts,
     gated by zero-init `gate_av`;
  3. channel attention (SE-style, query = other-modality mean token);
  4. spatial attention (per-position score); modulate x with
     alpha*channel + beta*spatial + (1-alpha); softmax(tanh(score)) is also
     returned as the tower's final pooling map (consumed at net_trans.py:922-924);
  5. LN -> grouped bottleneck down/BN/ReLU/up/BN -> LN -> zero-init `gate`.
Only stage 5's output is the residual added to the tower stream.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AdapterConfig
from ..ops.basic import (batch_norm, batch_norm_init, grouped_linear,
                         grouped_linear_init, layer_norm, layer_norm_init,
                         linear, linear_init)


def init_adapter(key, *, dim, other_dim, num_tokens_self, num_tokens_other,
                 cfg: AdapterConfig, dtype=jnp.float32):
    """One adapter: `dim`/`num_tokens_self` describe this tower's stream x,
    `other_dim`/`num_tokens_other` the prompting modality."""
    keys = jax.random.split(key, 12)
    down = dim // cfg.reduction_factor
    d_model = dim // 2
    params = {
        # stage 1: token-count resample (conv_adapter) + channel align (fc)
        "token_resample": linear_init(keys[0], num_tokens_other, num_tokens_self, dtype=dtype),
        "chan_align": linear_init(keys[1], other_dim, dim, dtype=dtype),
        # stage 2: latent prompts
        "latent_tokens": jax.random.uniform(keys[2], (cfg.num_tokens, dim), dtype),
        "gate_av": jnp.zeros((1,), dtype),
        # stage 3/4: channel + spatial attention affines
        "aff_audio_1": linear_init(keys[3], dim, dim, dtype=dtype),
        "aff_video_1": linear_init(keys[4], dim, dim, dtype=dtype),
        "aff_bottleneck": linear_init(keys[5], dim, d_model, dtype=dtype),
        "aff_video_2": linear_init(keys[6], dim, d_model, dtype=dtype),
        "aff_audio_2": linear_init(keys[7], dim, d_model, dtype=dtype),
        "aff_v_s_att": linear_init(keys[8], d_model, 1, dtype=dtype),
        "aff_v_c_att": linear_init(keys[9], d_model, dim, dtype=dtype),
        # stage 5: grouped bottleneck
        "down": grouped_linear_init(keys[10], dim, down, cfg.num_conv_group, dtype=dtype),
        "up": grouped_linear_init(keys[11], down, dim, cfg.num_conv_group, dtype=dtype),
    }
    if cfg.use_gate:
        params["gate"] = jnp.zeros((1,), dtype)
    state = {}
    if cfg.use_bn:
        params["bn1"], state["bn1"] = batch_norm_init(down, dtype)
        params["bn2"], state["bn2"] = batch_norm_init(dim, dtype)
    if cfg.is_before_layernorm:
        params["ln_before"] = layer_norm_init(dim, dtype)
    if cfg.is_post_layernorm:
        params["ln_post"] = layer_norm_init(dim, dtype)
    return params, state


def fold_eval(params, state, cfg: AdapterConfig):
    """Serving-time transform: fold the eval-mode BN affines into the
    bottleneck GEMM kernels and the scalar gate into ln_post.

    In eval, BN is a per-channel affine of its running stats, so
    bn(W x) == (inv*W) x + (b - inv*m) with inv = scale/sqrt(var+eps) —
    exact, and it deletes two full elementwise passes over the (B*T, N, C)
    activations per adapter call (the adapter stack is the largest measured
    non-matmul tail item: 13.3 ms/step, perf/results_r4/knockouts_int8.log).
    Returns (params', state') with the folded keys REMOVED; the forward
    detects folding by key absence.  Weight-quantization composes: the
    folded kernels quantize like any others and activation values are
    unchanged, so calibrated scale files stay valid.
    """
    if not (cfg.use_bn and "bn1" in params) and not (
            cfg.use_gate and cfg.is_post_layernorm and not cfg.avs_variant):
        return params, state
    p, s = dict(params), dict(state)
    if cfg.use_bn and "bn1" in p:
        for bn_name, gemm in (("bn1", "down"), ("bn2", "up")):
            bp, bs = p.pop(bn_name), s.pop(bn_name)
            inv = (bp["scale"] / jnp.sqrt(bs["var"] + 1e-5)).astype(
                p[gemm]["kernel"].dtype)
            gp = dict(p[gemm])
            g, gi, go = gp["kernel"].shape
            gp["kernel"] = gp["kernel"] * inv.reshape(g, 1, go)
            bias = bp["bias"] - bs["mean"] * (bp["scale"] /
                                              jnp.sqrt(bs["var"] + 1e-5))
            if "bias" in gp:
                bias = bias + gp["bias"] * inv
            gp["bias"] = bias.astype(gp["kernel"].dtype)
            p[gemm] = gp
    # gate * ln_post(x) == ln_post with (scale*g, bias*g) — AVE epilogue
    # order only (the AVS variant gates BEFORE ln_post, where LN absorbs the
    # gate's magnitude anyway)
    if (cfg.use_gate and "gate" in p and cfg.is_post_layernorm
            and not cfg.avs_variant):
        g = p.pop("gate")
        ln = dict(p["ln_post"])
        ln["scale"] = ln["scale"] * g
        ln["bias"] = ln["bias"] * g
        p["ln_post"] = ln
    return p, s


USE_FUSED_BOTTLENECK = False


def set_fused_bottleneck(enabled: bool) -> None:
    """Serving-time toggle: run stage 5 (ln_before -> grouped bottleneck ->
    ln_post) as one VMEM-resident Pallas pass
    (`ops/pallas/adapter_bottleneck.py`). Eval-only; requires BN and gate
    already folded (`fold_eval`). The adapter-stage knockouts measured stage
    5 as the entire 12.4 ms adapter tail of the serving step
    (perf/results_r5/knockouts_adstages.log)."""
    global USE_FUSED_BOTTLENECK
    USE_FUSED_BOTTLENECK = enabled


def _token_linear(p, x, *, with_bias=True):
    """Apply a (M, N) token-axis map to x (B, M, D) -> (B, N, D) THROUGH
    `ops.basic.linear` rather than a raw einsum: linear dispatches the int8
    serving path on "kernel_q" and is the hook `quant.calibrate_ave` records,
    so stage 1's fat resample GEMMs (the largest bf16 residue of the int8
    serving program — 2x 290 GFLOP/step at stage 0, perf/bf16_residue.py)
    become quantization-eligible for free. The swapaxes pair folds into the
    dot_general's dimension numbers; XLA emits the same single dot."""
    if not with_bias and "bias" in p:
        p = {k: v for k, v in p.items() if k != "bias"}
    return jnp.swapaxes(linear(p, jnp.swapaxes(x, -1, -2)), -1, -2)


def _kernel_f32(p):
    """Static kernel view that works for both fp ("kernel") and int8-serving
    ("kernel_q" x per-column "kscale") parameterizations."""
    if "kernel_q" in p:
        return p["kernel_q"].astype(jnp.float32) * p["kscale"][None, :]
    return p["kernel"]


def adapter(params, state, x, other, cfg: AdapterConfig, *, train=False):
    """x: (B, N, C) this tower's tokens; other: (B, M, D) prompting tokens.

    Returns (residual (B, N, C), spatial_att_maps (B, 1, N), new_state).
    """
    B, N, C = x.shape
    from ..ops import ablate
    if ablate.on("adapters"):  # perf knockout only (ops/ablate.py)
        return (jnp.zeros_like(x), jnp.full((B, 1, N), 1.0 / N, x.dtype),
                dict(state))

    # ---- stage 1: resample prompts to (B, N, C) ------------------------------
    # conv_adapter acts on the token axis (net_trans.py:553) and `fc` on the
    # channel axis — independent axes, so the maps commute exactly. Apply the
    # cheaper order for this geometry (e.g. stage-0 audio adapters halve their
    # FLOPs by aligning channels 192->96 before resampling 2304->4096 tokens).
    M, D = other.shape[1], other.shape[2]
    if ablate.on("ad_stage1"):  # perf knockout: skip resample/align GEMMs
        prompts = jnp.broadcast_to(jnp.mean(other, axis=(1, 2))[:, None, None],
                                   (B, N, C)).astype(x.dtype)
    elif cfg.avs_variant:
        # AVS copy (PVT_AVSModel.py:160-170): channel-align with `fc` first,
        # then bicubic-resample tokens on the sqrt grid (baked-matmul resize;
        # the conv_adapter weights are dead in that tree).
        from ..ops import dsp
        p = linear(params["chan_align"], other)                  # (B, M, C)
        s_in, s_out = int(M ** 0.5), int(N ** 0.5)
        p = p.reshape(B, s_in, s_in, C)
        p = dsp.resize_2d(p, s_out, s_out, kernel="cubic", align_corners=False)
        prompts = p.reshape(B, N, C)
    elif (resample_first_flops := M * N * D + N * D * C) <= M * D * C + M * N * C:
        p = _token_linear(params["token_resample"], other)        # (B, N, D)
        prompts = linear(params["chan_align"], p)                 # (B, N, C)
    else:
        # exact reorder: align(resample(x) + bias_n) =
        #   resample(x @ W) + bias_n * colsum(W) + b_c
        ca_nobias = {k: v for k, v in params["chan_align"].items()
                     if k != "bias"}
        p = linear(ca_nobias, other)                              # (B, M, C)
        prompts = _token_linear(params["token_resample"], p, with_bias=False)
        wsum = jnp.sum(_kernel_f32(params["chan_align"]), axis=0).astype(x.dtype)
        prompts = (prompts
                   + params["token_resample"]["bias"][None, :, None] * wsum[None, None, :]
                   + params["chan_align"]["bias"])

    # ---- stage 2: latent-token two-hop attention (net_trans.py:572-589) ------
    if not ablate.on("ad_stage2"):
        tok = params["latent_tokens"]                              # (T, C)
        # att_v2tk = softmax over prompt *channel-transposed* axis: the
        # reference bmm's (B,T,C)x(B,C,N) -> (B,T,N), softmax over N
        att_v2tk = jax.nn.softmax(jnp.einsum("tc,bnc->btn", tok, prompts), axis=-1)
        rep = tok[None] + jnp.einsum("btn,bnc->btc", att_v2tk, prompts)
        att_tk2x = jax.nn.softmax(jnp.einsum("bnc,btc->bnt", x, rep), axis=-1)
        x = x + params["gate_av"] * jnp.einsum("bnt,btc->bnc", att_tk2x, rep)

    if ablate.on("ad_stage34"):  # perf knockout: skip modulation
        sp_maps = jnp.full((B, 1, N), 1.0 / N, x.dtype)
    else:
        # ---- stage 3: channel attention (net_trans.py:592-598) ---------------
        other_mean = jnp.mean(prompts, axis=1)                     # (B, C)
        q_a = jax.nn.relu(linear(params["aff_audio_1"], other_mean))[:, None, :]
        q_v = jax.nn.relu(linear(params["aff_video_1"], x))        # (B, N, C)
        joint = jnp.mean(q_a * q_v, axis=1)                        # (B, C)
        joint = jax.nn.relu(linear(params["aff_bottleneck"], joint))
        ch_map = jax.nn.sigmoid(linear(params["aff_v_c_att"], joint))[:, None, :]  # (B,1,C)
        x_ch = x * (ch_map + 1.0)

        # ---- stage 4: spatial attention (net_trans.py:600-613) ---------------
        q_v2 = jax.nn.relu(linear(params["aff_video_2"], x_ch))    # (B, N, d)
        q_a2 = jax.nn.relu(linear(params["aff_audio_2"], other_mean))[:, None, :]
        sp_logits = linear(params["aff_v_s_att"], q_v2 * q_a2)     # (B, N, 1)
        sp_sigmoid = jax.nn.sigmoid(sp_logits)                     # (B, N, 1)
        sp_maps = jax.nn.softmax(jnp.tanh(sp_logits).transpose(0, 2, 1), axis=-1)  # (B,1,N)
        x = x * (cfg.alpha * ch_map + cfg.beta * sp_sigmoid + 1.0 - cfg.alpha)

    # ---- stage 5: bottleneck (net_trans.py:626-671) --------------------------
    # The AVS copy skips ln_before in its live multimodal branch
    # (PVT_AVSModel.py:272-276 has no ln_before; the weights exist but are
    # dead there).
    if ablate.on("ad_stage5"):  # perf knockout: zero residual
        return jnp.zeros_like(x), sp_maps, dict(state)
    if (USE_FUSED_BOTTLENECK and not train and not cfg.avs_variant
            and cfg.is_post_layernorm and "bn1" not in params
            and "bn2" not in params and "gate" not in params):
        # post-fold serving shape: one fused VMEM pass over the token rows
        from ..ops.pallas.adapter_bottleneck import fused_bottleneck
        out = fused_bottleneck(
            params, x,
            has_ln1=bool(cfg.is_before_layernorm and not cfg.avs_variant))
        return out, sp_maps, dict(state)
    z = x
    if cfg.is_before_layernorm and not cfg.avs_variant:
        z = layer_norm(params["ln_before"], z)
    new_state = dict(state)
    h = grouped_linear(params["down"], z)
    if cfg.use_bn and "bn1" in params:   # absent after fold_eval
        h, new_state["bn1"] = batch_norm(params["bn1"], state["bn1"], h,
                                         train=train, axis=-1)
    h = jax.nn.relu(h)
    out = grouped_linear(params["up"], h)
    if cfg.use_bn and "bn2" in params:
        out, new_state["bn2"] = batch_norm(params["bn2"], state["bn2"], out,
                                           train=train, axis=-1)
    # Epilogue order differs per copy: AVE/AVVP/AVQA apply ln_post then gate
    # (net_trans.py:667-671); AVS gates FIRST then ln_post
    # (PVT_AVSModel.py:306-311).
    if cfg.avs_variant:
        if cfg.use_gate and "gate" in params:
            out = params["gate"] * out
        if cfg.is_post_layernorm:
            out = layer_norm(params["ln_post"], out)
    else:
        if cfg.is_post_layernorm:
            out = layer_norm(params["ln_post"], out)
        if cfg.use_gate and "gate" in params:   # folded into ln_post by fold_eval
            out = params["gate"] * out
    return out, sp_maps, new_state
