"""AVQA model structural tests (tiny config) + QstEncoder parity vs torch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dg_sct_tpu.configs import AVQAModelConfig
from dg_sct_tpu.models import avqa
from dg_sct_tpu.train import avqa_train
from tests.test_ave_model import tiny_cfg


def tiny_avqa_cfg():
    import dataclasses
    base = tiny_cfg()
    # mirror the AVQA flag structure (is_bn=0, audio is_gate=0, visual gate
    # hardcoded True; net_grd_avst/base_options.py:70-81) at tiny dims —
    # tiny channel counts keep num_conv_group=2 for divisibility
    aud = dataclasses.replace(base.adapter, use_bn=False, use_gate=False)
    vis = dataclasses.replace(base.adapter, use_bn=False, use_gate=True)
    return AVQAModelConfig(swin=base.swin, htsat=base.htsat, adapter=aud,
                           adapter_vis=vis, num_frames=base.num_frames,
                           embed_dim=base.swin.num_features,  # 128 for tiny
                           qst_vocab_size=93, ans_vocab_size=42)


def test_qst_encoder_matches_torch():
    vocab, E, H, B, L = 93, 24, 24, 3, 14
    params = avqa.init_qst_encoder(jax.random.PRNGKey(0), vocab, E, E, H)

    emb = torch.nn.Embedding(vocab, E)
    lstm = torch.nn.LSTM(E, H, 1)
    fc = torch.nn.Linear(2 * H, E)
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(np.asarray(params["word2vec"])))
        lstm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["wi"]).T))
        lstm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["wh"]).T))
        lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["bi"])))
        lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["lstm"]["bh"])))
        fc.weight.copy_(torch.from_numpy(np.asarray(params["fc"]["kernel"]).T))
        fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["bias"])))

    q = np.random.RandomState(0).randint(0, vocab, size=(B, L))
    ours = np.asarray(avqa.qst_encoder(params, jnp.asarray(q)))
    with torch.no_grad():
        vec = torch.tanh(emb(torch.from_numpy(q))).transpose(0, 1)
        _, (h, c) = lstm(vec)
        feat = torch.cat((h, c), 2).transpose(0, 1).reshape(B, -1)
        ref = fc(torch.tanh(feat)).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-5


@pytest.mark.slow
def test_tiny_avqa_forward_and_loss():
    cfg = tiny_avqa_cfg()
    params, state = avqa.init_avqa_model(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.num_frames
    rs = np.random.RandomState(0)
    wave = jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32))
    posi = jnp.asarray(rs.rand(B, T, 64, 64, 3).astype(np.float32))
    nega = jnp.asarray(rs.rand(B, T, 64, 64, 3).astype(np.float32))
    q = jnp.asarray(rs.randint(0, 93, size=(B, 14)))
    out, _ = avqa.forward(params, state, wave, posi, nega, q, cfg, train=False)
    assert out["out_qa"].shape == (B, 42)
    assert out["out_match_posi"].shape == (B * T, 2)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()

    answer = jnp.asarray(rs.randint(0, 42, size=(B,)))
    loss = avqa_train.avqa_loss(out, answer)
    assert np.isfinite(float(loss))
