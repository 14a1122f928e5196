"""Pretrain suite tests: CLIP towers vs torch mirror, prompt learner, tiny
pretrain forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dg_sct_tpu.configs import (AVEModelConfig, AdapterConfig, CLIPConfig,
                                PretrainModelConfig, PromptConfig)
from dg_sct_tpu.models import clip as C
from dg_sct_tpu.models import pretrain as PT
from dg_sct_tpu.models import prompt_learner as PL
from tests.test_ave_model import tiny_cfg


def tiny_clip(vision_layers=2):
    return CLIPConfig(image_size=32, vision_patch=8, vision_width=24,
                      vision_layers=vision_layers, vision_heads=2, embed_dim=16,
                      context_length=77, text_width=16, text_layers=2, text_heads=2)


def test_quick_gelu_matches_torch():
    x = np.linspace(-3, 3, 13).astype(np.float32)
    ours = np.asarray(C.quick_gelu(jnp.asarray(x)))
    ref = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-6


def test_clip_text_encoder_causal():
    cfg = tiny_clip()
    params = C.init_text(jax.random.PRNGKey(0), cfg)
    tok = np.zeros((2, 77), np.int32)
    tok[0, :5] = [49406, 10, 20, 30, 49407]
    tok[1, :3] = [49406, 11, 49407]
    feats = C.encode_text(params, jnp.asarray(tok), cfg)
    assert feats.shape == (2, 16)
    # causal mask: changing a token AFTER the EOT must not change features
    tok2 = tok.copy()
    tok2[0, 50] = 123
    f2 = C.encode_text(params, jnp.asarray(tok2), cfg)
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(f2[0]), atol=1e-5)


def test_prompt_buffers_and_assembly():
    ccfg = tiny_clip()
    pcfg = PromptConfig(ctx_init="a photo of a")
    emb = np.random.RandomState(0).randn(49408, ccfg.text_width).astype(np.float32) * 0.02
    buffers = PL.build_prompt_buffers(["dog", "violin fiddle"], emb, pcfg, ccfg)
    assert buffers["n_ctx"] == 4
    assert buffers["token_prefix"].shape == (2, 1, ccfg.text_width)
    assert buffers["token_suffix"].shape == (2, 77 - 5, ccfg.text_width)

    params = PL.init_prompt_learner(jax.random.PRNGKey(1), buffers,
                                    ccfg.embed_dim, ccfg.text_width)
    for pos in ("end", "middle", "front"):
        prompts = PL.build_prompts(params, buffers, class_token_position=pos)
        assert prompts.shape == (2, 77, ccfg.text_width)
    # 'end' assembly: [prefix, ctx, suffix]
    pe = PL.build_prompts(params, buffers, class_token_position="end")
    np.testing.assert_allclose(np.asarray(pe[:, 1:5]),
                               np.broadcast_to(np.asarray(params["ctx"])[None], (2, 4, ccfg.text_width)),
                               atol=1e-6)


@pytest.mark.slow
def test_tiny_pretrain_forward():
    base = tiny_cfg()
    # vision layer count must equal total HTS-AT blocks (tiny: 1+1+1+1)
    ccfg = tiny_clip(vision_layers=sum(base.htsat.depths))
    cfg = PretrainModelConfig(clip=ccfg, htsat=base.htsat,
                              adapter=AdapterConfig(reduction_factor=2, num_tokens=4),
                              num_frames=2, num_classes=3)
    params, state, buffers = PT.init_pretrain_model(
        jax.random.PRNGKey(0), cfg, ["dog", "cat", "bird"])
    B, T = 2, cfg.num_frames
    rs = np.random.RandomState(0)
    wave = jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32))
    imgs = jnp.asarray(rs.rand(B, T, 32, 32, 3).astype(np.float32))
    out, _ = PT.forward(params, state, buffers, wave, imgs, cfg, train=False)
    assert out["event_scores"].shape == (B * T, 3)
    assert out["logits_audio_image"].shape == (B, B)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()

    from dg_sct_tpu.train import pretrain_train
    labels = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 2]])
    loss = pretrain_train.pretrain_loss(out, labels, epoch=1, num_frames=T)
    assert np.isfinite(float(loss))

    acc = pretrain_train.zero_shot_accuracy(
        out["event_scores"], jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[[0]], (B, T, 1)).reshape(B, T, 3)))
    assert 0.0 <= float(acc) <= 100.0


def test_few_shot_subsample():
    from dg_sct_tpu.train.pretrain_train import few_shot_subsample
    labels = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
    keep = few_shot_subsample(labels, 2, seed=0)
    kept_labels = labels[keep]
    for c in (0, 1, 2):
        assert (kept_labels == c).sum() == 2


def test_clap_text_pipeline():
    """CLAPTextEncoder pipeline (prompt_learner.py:76-106): RoBERTa-base
    text_branch -> pooler -> 768->512->512 projection. Shape, determinism,
    background-class append, and checkpoint-state hookup."""
    from dg_sct_tpu.models import clap_text as CT

    feats = CT.compute_clap_text_features(["dog", "cat"], weak=True)
    assert feats.shape == (2, 512) and feats.dtype == np.float32
    assert np.isfinite(feats).all()
    # weak=False appends 'background' (prompt_learner.py:81-83)
    feats_bg = CT.compute_clap_text_features(["dog", "cat"], weak=False)
    assert feats_bg.shape == (3, 512)
    np.testing.assert_allclose(feats_bg[:2], feats, atol=1e-6)
    # deterministic across calls (static buffer semantics)
    np.testing.assert_allclose(
        CT.compute_clap_text_features(["dog", "cat"]), feats, atol=0)

    # converter hook: a synthetic CLAP state dict with the reference's key
    # prefixes changes the projection output and round-trips the split
    rs = np.random.RandomState(0)
    sd = {
        "text_projection.0.weight": rs.randn(512, 768).astype(np.float32) * 0.02,
        "text_projection.0.bias": np.zeros(512, np.float32),
        "text_projection.2.weight": rs.randn(512, 512).astype(np.float32) * 0.02,
        "text_projection.2.bias": np.zeros(512, np.float32),
    }
    branch, transform, proj = CT.split_clap_text_state(sd)
    assert set(proj) == {"0.weight", "0.bias", "2.weight", "2.bias"}
    assert branch == {} and transform == {}
    feats_ck = CT.compute_clap_text_features(["dog", "cat"], clap_state_dict=sd)
    assert feats_ck.shape == (2, 512)
    assert np.max(np.abs(feats_ck - feats)) > 1e-4


def test_feature_fusion_matches_torch():
    """DAF/AFF/iAFF vs a direct torch build of the WACV-2021 fusion modules
    (1x1 conv + BN chains; reference `pretrain/nets/feature_fusion.py`)."""
    from dg_sct_tpu.models import feature_fusion as FF

    C, r, B, H, W = 8, 4, 2, 3, 3
    rs = np.random.RandomState(0)
    x = rs.randn(B, H, W, C).astype(np.float32)
    res = rs.randn(B, H, W, C).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(FF.daf(jnp.asarray(x), jnp.asarray(res))), x + res)

    def torch_att(params, pooled=False):
        inter = C // r
        seq = []
        if pooled:
            seq.append(torch.nn.AdaptiveAvgPool2d(1))
        seq += [torch.nn.Conv2d(C, inter, 1), torch.nn.BatchNorm2d(inter),
                torch.nn.ReLU(), torch.nn.Conv2d(inter, C, 1),
                torch.nn.BatchNorm2d(C)]
        m = torch.nn.Sequential(*seq).eval()
        conv1, bn1, conv2, bn2 = ([l for l in m if isinstance(l, torch.nn.Conv2d)][0],
                                  [l for l in m if isinstance(l, torch.nn.BatchNorm2d)][0],
                                  [l for l in m if isinstance(l, torch.nn.Conv2d)][1],
                                  [l for l in m if isinstance(l, torch.nn.BatchNorm2d)][1])
        with torch.no_grad():
            conv1.weight.copy_(torch.from_numpy(
                np.asarray(params["fc1"]["kernel"]).T[:, :, None, None]))
            conv1.bias.copy_(torch.from_numpy(np.asarray(params["fc1"]["bias"])))
            conv2.weight.copy_(torch.from_numpy(
                np.asarray(params["fc2"]["kernel"]).T[:, :, None, None]))
            conv2.bias.copy_(torch.from_numpy(np.asarray(params["fc2"]["bias"])))
            for bn, name in ((bn1, "bn1"), (bn2, "bn2")):
                bn.weight.copy_(torch.from_numpy(np.asarray(params[name]["scale"])))
                bn.bias.copy_(torch.from_numpy(np.asarray(params[name]["bias"])))
        return m

    # AFF
    pa, sa = FF.init_aff(jax.random.PRNGKey(0), channels=C, r=r)
    ours, _ = FF.aff(pa, sa, jnp.asarray(x), jnp.asarray(res), train=False)
    tl = torch_att(pa["local_att"])
    tg = torch_att(pa["global_att"], pooled=True)
    with torch.no_grad():
        xt = torch.from_numpy((x + res).transpose(0, 3, 1, 2))
        wei = torch.sigmoid(tl(xt) + tg(xt))
        ref = (2 * torch.from_numpy(x.transpose(0, 3, 1, 2)) * wei
               + 2 * torch.from_numpy(res.transpose(0, 3, 1, 2)) * (1 - wei))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)

    # iAFF (round 2 reuses global_att — the reference's own forward)
    pi, si = FF.init_iaff(jax.random.PRNGKey(1), channels=C, r=r)
    ours2, _ = FF.iaff(pi, si, jnp.asarray(x), jnp.asarray(res), train=False)
    tl1 = torch_att(pi["local_att"])
    tg1 = torch_att(pi["global_att"], pooled=True)
    tl2 = torch_att(pi["local_att2"])
    with torch.no_grad():
        xt = torch.from_numpy((x + res).transpose(0, 3, 1, 2))
        xr = torch.from_numpy(x.transpose(0, 3, 1, 2))
        rr = torch.from_numpy(res.transpose(0, 3, 1, 2))
        wei = torch.sigmoid(tl1(xt) + tg1(xt))
        xi = xr * wei + rr * (1 - wei)
        wei2 = torch.sigmoid(tl2(xi) + tg1(xi))
        ref2 = xr * wei2 + rr * (1 - wei2)
    np.testing.assert_allclose(np.asarray(ours2),
                               ref2.numpy().transpose(0, 2, 3, 1), atol=1e-5)
