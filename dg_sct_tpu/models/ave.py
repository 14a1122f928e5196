"""AVE flagship model — the `MMIL_Net` equivalent (`DG-SCT/AVE/nets/net_trans.py:677-937`).

forward: (wave (B, 10, L), images (B, 10, H, W, 3)) ->
  is_event_scores (B, 10), event_scores (B, 28), av_gate (B, 10), av_score (B, 28)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import AVEModelConfig
from . import htsat as H
from . import interleave as I
from . import swinv2 as S
from .heads import ave as heads


def init_ave_model(key, cfg: AVEModelConfig, dtype=jnp.float32):
    """Returns (params, state)."""
    k = jax.random.split(key, 5)
    swin_params = S.init_swinv2(k[0], cfg.swin, dtype)
    htsat_params, htsat_state = H.init_htsat(k[1], cfg.htsat, dtype)
    adapter_params, adapter_state = I.init_adapters(k[2], cfg, dtype)
    params = {
        "swin": swin_params,
        "htsat": htsat_params,
        "adapters": adapter_params,
        "temporal_attn": heads.init_temporal_attention(
            k[3], cfg.swin.num_features, cfg.htsat.num_features, dtype),
        "CMBS": heads.init_cmbs(k[4], cfg.num_classes, dtype),
    }
    state = {"htsat": htsat_state, "adapters": adapter_state}
    return params, state


def forward(params, state, wave, images, cfg: AVEModelConfig, *, train=False,
            rng=None, mixup_lambda=None):
    """wave: (B, T, L) raw audio; images: (B, T, H, W, 3) channels-last frames.

    Frames fold into the batch axis — `(b t) ...` — exactly like
    net_trans.py:851-854, which also makes the leading axis the data-parallel
    sharding axis at full T*B width.
    """
    # Mixed precision: params arrive as f32 masters from the optimizer; cast
    # float leaves to the compute dtype HERE so no f32 leaf (e.g. a trainable
    # adapter kernel) silently promotes every downstream op to f32 — without
    # this, `f_v + v_res` after the first adapter turns the whole remaining
    # network f32 (half MXU rate, 2x HBM). No-op for f32 configs; grads flow
    # back through the cast to the f32 masters.
    cd = cfg.compute_dtype
    if cd != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cd) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params)
        wave = wave.astype(cd)
        images = images.astype(cd)

    B, T = wave.shape[0], wave.shape[1]
    wave_f = wave.reshape(B * T, -1)
    img_f = images.reshape((B * T,) + images.shape[2:])

    enc_rng = head_rng = None
    if rng is not None:
        enc_rng, head_rng = jax.random.split(rng)

    feats, new_state = I.forward(params, state, wave_f, img_f, cfg, train=train,
                                 rng=enc_rng, mixup_lambda=mixup_lambda)
    f_v = feats["f_v"].reshape(B, T, -1)     # (B, 10, 1536)
    f_a = feats["f_a"].reshape(B, T, -1)     # (B, 10, 768)

    from ..ops import ablate
    if ablate.on("heads"):  # perf knockout only (ops/ablate.py)
        ev = (f_v.mean(-1) + f_a.mean(-1)).transpose(1, 0)[..., None]  # (T,B,1)
        n_cls = params["CMBS"]["localize_event"]["kernel"].shape[-1]
        fake = f_v.mean(1)[:, :n_cls] + f_a.mean(1)[:, :n_cls]
        video_q = audio_q = av_gate = None
        is_event_scores, event_scores, av_score = ev, fake, fake
        av_gate = ev
    else:
        video_q, audio_q, av_gate = heads.temporal_attention(
            params["temporal_attn"], f_v, f_a, train=train, rng=head_rng)
        is_event_scores, event_scores, av_score = heads.cmbs(
            params["CMBS"], video_q, audio_q)

    # driver layout (main_trans.py:114-118): (10,B,1) -> (B,10)
    out = {
        "is_event_scores": is_event_scores[..., 0].transpose(1, 0),
        "event_scores": event_scores,
        "av_gate": av_gate[..., 0].transpose(1, 0),
        "av_score": av_score,
    }
    return out, new_state
