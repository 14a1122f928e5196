"""Pretrain suite model — the CLIP x CLAP `MMIL_Net` equivalent
(`pretrain/nets/net_trans.py:601-970`).

Structure: CLIP ViT-B/32 visual tower and CLAP-variant HTS-AT audio tower run
in lockstep — HTS-AT's 12 blocks pair 1:1 with the 12 ViT blocks
(`lavish_forward`, net_trans.py:818-908); an adapter pair fires around each
block half. Heads:
  * clip_matching: prompt-learned text features + ClipAdapter blend (ratio
    0.2), cosine logits vs the projected class token (net_trans.py:770-785);
  * clap_matching: cosine logits vs STATIC CLAP text features ("The sounds of
    <class>" through RoBERTa — precomputed host-side, passed as a buffer);
  * modality-weighted event scores w1*logits_v + w2*logits_a
    (net_trans.py:808-810);
  * symmetric audio<->image contrastive logits (AudioVisualContrastive).

TPU-first notes: adapters in this suite see the ViT stream with its class
token (50 tokens); the HTS-AT tower reuses our standard blocks (the CLAP
`enable_fusion` patch-embed weights are skipped by the reference loader,
net_trans.py:654-692, so the plain patch-embed path is the live one).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import PretrainModelConfig
from ..ops.basic import linear, linear_init
from . import adapter as A
from . import clip as C
from . import htsat as H
from . import prompt_learner as P


def htsat_block_list(cfg):
    """Flatten HTS-AT (stage, block) pairs in order — 12 total."""
    out = []
    for s, depth in enumerate(cfg.htsat.depths):
        for b in range(depth):
            out.append((s, b))
    return out


def init_pretrain_model(key, cfg: PretrainModelConfig, classnames,
                        clap_text_features=None, dtype=jnp.float32):
    """`clap_text_features`: (n_cls, 512) precomputed CLAP text embeddings
    (see `compute_clap_text_features`); random if None (train-from-scratch)."""
    k = jax.random.split(key, 12)
    visual = C.init_visual(k[0], cfg.clip, dtype)
    text = C.init_text(k[1], cfg.clip, dtype)
    htsat_params, htsat_state = H.init_htsat(k[2], cfg.htsat, dtype)

    buffers = P.build_prompt_buffers(
        list(classnames), jax.device_get(text["token_embedding"]), cfg.prompt, cfg.clip)

    n_vit = cfg.clip.vision_layers
    vit_tokens = (cfg.clip.image_size // cfg.clip.vision_patch) ** 2 + 1  # 50
    blocks = htsat_block_list(cfg)
    # the pretrain interleave pairs ViT blocks 1:1 with HTS-AT blocks
    # (net_trans.py:861-908: 12 ViT blocks x 12 HTS-AT blocks)
    assert len(blocks) == n_vit, (len(blocks), n_vit)
    adapters = {n: [] for n in ("a_p1", "v_p1", "a_p2", "v_p2")}
    adapter_state = {n: [] for n in ("a_p1", "v_p1", "a_p2", "v_p2")}
    akeys = jax.random.split(k[3], 4 * len(blocks))
    ki = 0
    for i, (s, b) in enumerate(blocks):
        a_dim = cfg.htsat.stage_dim(s)
        ar = cfg.htsat.stage_resolution(s)
        a_tok = ar[0] * ar[1]
        v_dim, v_tok = cfg.clip.vision_width, vit_tokens
        for name in ("a_p1", "a_p2"):
            p, st = A.init_adapter(akeys[ki], dim=a_dim, other_dim=v_dim,
                                   num_tokens_self=a_tok, num_tokens_other=v_tok,
                                   cfg=cfg.adapter, dtype=dtype)
            adapters[name].append(p)
            adapter_state[name].append(st)
            ki += 1
        for name in ("v_p1", "v_p2"):
            p, st = A.init_adapter(akeys[ki], dim=v_dim, other_dim=a_dim,
                                   num_tokens_self=v_tok, num_tokens_other=a_tok,
                                   cfg=cfg.adapter, dtype=dtype)
            adapters[name].append(p)
            adapter_state[name].append(st)
            ki += 1

    n_cls = buffers["token_prefix"].shape[0]
    if clap_text_features is None:
        clap_text_features = jax.random.normal(k[4], (n_cls, cfg.clip.embed_dim), dtype) * 0.02

    params = {
        "visual": visual,
        "text": text,
        "htsat": htsat_params,
        "adapters": adapters,
        "prompt_learner": P.init_prompt_learner(k[5], buffers, cfg.clip.embed_dim,
                                                cfg.clip.text_width, dtype),
        "clip_adapter": P.init_clip_adapter(k[6], cfg.clip.embed_dim, 4, dtype),
        "clip_adapter_text": P.init_clip_adapter(k[7], cfg.clip.embed_dim, 4, dtype),
        # CLAP projects audio into the same 512-d space as CLIP embeddings;
        # generalized to clip.embed_dim (512 at full scale)
        "audio_projection": {"fc1": linear_init(k[8], cfg.htsat.num_features, 512, dtype=dtype),
                             "fc2": linear_init(k[9], 512, cfg.clip.embed_dim, dtype=dtype)},
        "clap_text_features": jnp.asarray(clap_text_features, dtype),
        "logit_scale_a": jnp.asarray(jnp.log(1.0 / 0.07), dtype),
        "av_contrastive_fc": linear_init(k[10], cfg.clip.embed_dim, cfg.clip.embed_dim, dtype=dtype),
    }
    state = {"htsat": htsat_state, "adapters": adapter_state}
    return params, state, buffers


def clip_matching(params, buffers, visual_grd, cfg: PretrainModelConfig, *, ratio=0.2):
    """net_trans.py:770-785."""
    x = P.clip_adapter(params["clip_adapter"], visual_grd)
    visual_grd = ratio * x + (1 - ratio) * visual_grd
    visual_grd = visual_grd / (jnp.linalg.norm(visual_grd, axis=-1, keepdims=True) + 1e-8)
    prompts = P.build_prompts(params["prompt_learner"], buffers,
                              class_token_position=cfg.prompt.class_token_position)
    text = C.encode_text_embeddings(params["text"], prompts,
                                    jnp.asarray(buffers["tokenized"]), cfg.clip)
    xt = P.clip_adapter(params["clip_adapter_text"], text)
    text = ratio * xt + (1 - ratio) * text
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    return jnp.exp(params["text"]["logit_scale"]) * visual_grd @ text.T


def clap_matching(params, audio_features):
    """net_trans.py:788-795 — static CLAP text features."""
    text = params["clap_text_features"]
    text = text / (jnp.linalg.norm(text, axis=-1, keepdims=True) + 1e-8)
    a = audio_features / (jnp.linalg.norm(audio_features, axis=-1, keepdims=True) + 1e-8)
    return jnp.exp(params["logit_scale_a"]) * a @ text.T


def forward(params, state, buffers, wave, images, cfg: PretrainModelConfig, *,
            train=False, rng=None, mixup_lambda=None):
    """wave: (B, T, L); images: (B, T, H, W, 3) at 224.

    Returns ({event_scores (B*T, n_cls), logits_audio_image, logits_image_audio},
    new_state).
    """
    B, T = wave.shape[0], wave.shape[1]
    imgs = images.reshape((B * T,) + images.shape[2:])
    wave_f = wave.reshape(B * T, -1)
    frng = jax.random.fold_in(rng, 0) if rng is not None else None

    x = C.visual_embed(params["visual"], imgs, cfg.clip)          # (N, 50, 768)
    y, new_htsat_state = H.frontend(params["htsat"], state["htsat"], wave_f,
                                    cfg.htsat, train=train, rng=frng,
                                    mixup_lambda=mixup_lambda)

    aud_plan = H.block_plan(cfg.htsat)
    blocks = htsat_block_list(cfg)
    new_adapter_state = {n: list(state["adapters"][n]) for n in state["adapters"]}
    acfg = cfg.adapter

    for cnt, (s, b) in enumerate(blocks):
        meta = aud_plan[s][b]
        # audio block first (reference order: layer(y) then ViT attention half)
        y = H.block(params["htsat"]["layers"][s]["blocks"][b], y, dim=meta["dim"],
                    heads=meta["heads"], res=meta["res"], ws=meta["ws"],
                    shift=meta["shift"], drop_path_rate=meta["dpr"], train=train)
        x = x + C.attention_part(params["visual"]["resblocks"][cnt], x,
                                 num_heads=cfg.clip.vision_heads)

        a_res, _, st = A.adapter(params["adapters"]["a_p1"][cnt],
                                 state["adapters"]["a_p1"][cnt], y, x, acfg, train=train)
        new_adapter_state["a_p1"][cnt] = st
        v_res, _, st = A.adapter(params["adapters"]["v_p1"][cnt],
                                 state["adapters"]["v_p1"][cnt], x, y, acfg, train=train)
        new_adapter_state["v_p1"][cnt] = st
        x = x + v_res
        y = y + a_res

        x = x + C.mlp_part(params["visual"]["resblocks"][cnt], x)
        a_res, _, st = A.adapter(params["adapters"]["a_p2"][cnt],
                                 state["adapters"]["a_p2"][cnt], y, x, acfg, train=train)
        new_adapter_state["a_p2"][cnt] = st
        v_res, _, st = A.adapter(params["adapters"]["v_p2"][cnt],
                                 state["adapters"]["v_p2"][cnt], x, y, acfg, train=train)
        new_adapter_state["v_p2"][cnt] = st
        x = x + v_res
        y = y + a_res

        # stage-end downsample when this was the stage's last block
        if b == cfg.htsat.depths[s] - 1 and "downsample" in params["htsat"]["layers"][s]:
            y = H.patch_merging(params["htsat"]["layers"][s]["downsample"], y,
                                cfg.htsat.stage_resolution(s))

    # audio head: tscam latent embedding -> audio_projection (net_trans.py:911-952)
    head = H.tscam_head(params["htsat"], y, cfg.htsat)
    latent = head["latent_output"]
    ap = params["audio_projection"]
    a_cls = linear(ap["fc2"], jax.nn.relu(linear(ap["fc1"], latent)))   # (N, 512)

    v_cls = C.visual_project(params["visual"], x)                        # (N, 512)

    logits_v = clip_matching(params, buffers, v_cls, cfg)
    logits_a = clap_matching(params, a_cls)
    denom = logits_v + logits_a
    w1 = logits_v / denom
    w2 = logits_a / denom
    event_scores = w1 * logits_v + w2 * logits_a

    # symmetric AV contrastive logits, clip-pooled (AudioVisualContrastive,
    # net_trans.py:284-301: fc on audio, mean over the 10 segments, B x B)
    a_proj = linear(params["av_contrastive_fc"], a_cls)
    vp = jnp.mean(v_cls.reshape(B, T, -1), axis=1)
    ap = jnp.mean(a_proj.reshape(B, T, -1), axis=1)
    vn = vp / (jnp.linalg.norm(vp, axis=-1, keepdims=True) + 1e-8)
    an = ap / (jnp.linalg.norm(ap, axis=-1, keepdims=True) + 1e-8)
    scale = jnp.exp(params["text"]["logit_scale"])
    logits_audio_image = scale * an @ vn.T
    logits_image_audio = scale * vn @ an.T

    out = {"event_scores": event_scores, "v_cls": v_cls, "a_cls": a_cls,
           "logits_audio_image": logits_audio_image,
           "logits_image_audio": logits_image_audio}
    return out, {"htsat": new_htsat_state, "adapters": new_adapter_state}


def compute_clap_text_features(classnames, *, weak=True, clap_state_dict=None):
    """Host-side CLAP text features: "The sounds of <name>" through the CLAP
    text branch (RoBERTa-base) and `text_projection` MLP — the full
    CLAPTextEncoder pipeline (see `models/clap_text.py`). Pass the 630k CLAP
    checkpoint's state dict to run with real weights."""
    from . import clap_text
    return clap_text.compute_clap_text_features(
        classnames, weak=weak, clap_state_dict=clap_state_dict)
