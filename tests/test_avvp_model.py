"""AVVP model structural tests (tiny config) + grouping lib unit tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.configs import AVVPModelConfig
from dg_sct_tpu.models import avvp, grouping as G
from tests.test_ave_model import tiny_cfg


def tiny_avvp_cfg():
    base = tiny_cfg()
    return AVVPModelConfig(swin=base.swin, htsat=base.htsat, adapter=base.adapter,
                           num_frames=base.num_frames, dim=32,
                           depth_aud=1, depth_vis=1, depth_av=1)


def test_hard_softmax_straight_through():
    logits = jnp.asarray([[1.0, 2.0, 0.5]])
    y = G.hard_softmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(y), [[0.0, 1.0, 0.0]])
    # gradient flows via softmax
    g = jax.grad(lambda l: jnp.sum(G.hard_softmax(l, -1) * jnp.asarray([1.0, 0.0, 0.0])))(logits[0])
    assert np.any(np.asarray(g) != 0)


def test_assign_attention_shapes_and_modes():
    dim, S2, S, B = 16, 5, 11, 2
    params = G.assign_attention_init(jax.random.PRNGKey(0), dim)
    q = jnp.asarray(np.random.RandomState(0).randn(B, S2, dim).astype(np.float32))
    k = jnp.asarray(np.random.RandomState(1).randn(B, S, dim).astype(np.float32))
    for hard in (False, True):
        out, attn = G.assign_attention(params, q, k, hard=hard, gumbel=False,
                                       return_attn=True)
        assert out.shape == (B, S2, dim)
        assert attn["hard"].shape == (B, S2, S)
        assert attn["soft"].shape == (B, S2, S)
        # soft map is 1 + softmax -> in (1, 2)
        s = np.asarray(attn["soft"])
        assert (s > 1.0).all() and (s < 2.0).all()


def test_modality_trans_groups():
    dim, L, B, S1 = 16, 10, 2, 7
    params = G.modality_trans_init(jax.random.PRNGKey(1), dim, depth=2,
                                   num_group_tokens=S1, num_output_groups=S1)
    x = jnp.asarray(np.random.RandomState(2).randn(B, L, dim).astype(np.float32))
    tok = jnp.asarray(np.random.RandomState(3).randn(S1, dim).astype(np.float32))
    out, attn, x_attn = G.modality_trans(params, x, tok, return_attn=True)
    assert out.shape == (B, S1, dim)
    assert x_attn.shape == (B, L, dim)
    assert attn["soft"].shape == (B, S1, L)


@pytest.mark.slow
def test_tiny_avvp_forward():
    cfg = tiny_avvp_cfg()
    params, state = avvp.init_avvp_model(jax.random.PRNGKey(0), cfg)
    B, T = 2, cfg.num_frames
    rs = np.random.RandomState(0)
    wave = jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32))
    imgs = jnp.asarray(rs.rand(B, T, 64, 64, 3).astype(np.float32))
    st = jnp.asarray(rs.randn(B, T, 512).astype(np.float32))
    out, _ = avvp.forward(params, state, wave, imgs, st, cfg, train=False)
    assert out["global_prob"].shape == (B, 25)
    assert out["a_frame_prob"].shape == (B, T, 25)
    assert out["aud_cls_prob"].shape == (25, 25)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_avvp_loss():
    from dg_sct_tpu.train import avvp_train
    rs = np.random.RandomState(0)
    out = {
        "global_prob": jnp.asarray(rs.rand(2, 25).astype(np.float32)),
        "a_prob": jnp.asarray(rs.rand(2, 25).astype(np.float32)),
        "v_prob": jnp.asarray(rs.rand(2, 25).astype(np.float32)),
        "aud_cls_prob": jnp.asarray(rs.randn(25, 25).astype(np.float32)),
        "vis_cls_prob": jnp.asarray(rs.randn(25, 25).astype(np.float32)),
    }
    target = jnp.asarray((rs.rand(2, 25) > 0.7).astype(np.float32))
    loss = avvp_train.avvp_loss(out, target)
    assert np.isfinite(float(loss))

    import torch
    ours = float(avvp_train.bce_probs(out["global_prob"], target))
    ref = float(torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(np.asarray(out["global_prob"])),
        torch.from_numpy(np.asarray(target))))
    assert abs(ours - ref) < 1e-5
