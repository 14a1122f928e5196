"""Structural tests for the AVE flagship model (tiny config) and shape parity
for the full config's static plans."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.configs import (AVEModelConfig, AdapterConfig, AudioFrontendConfig,
                                HTSATConfig, SwinV2Config, ave_adapter_dims,
                                ave_paired_layout)
from dg_sct_tpu.models import ave


def tiny_cfg():
    frontend = AudioFrontendConfig(sample_rate=3200, clip_seconds=1, n_fft=256,
                                   hop_size=320, mel_bins=16, fmax=1500.0,
                                   spec_size=32, time_drop_width=8)
    # still exercises the 3:1 stage-2 pairing (3 vis vs 1 audio blocks)
    swin = SwinV2Config(img_size=64, patch_size=4, embed_dim=16,
                        depths=(1, 1, 3, 1), num_heads=(2, 2, 2, 2),
                        window_size=4, drop_path_rate=0.0)
    htsat = HTSATConfig(spec_size=32, patch_size=4, embed_dim=8,
                        depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                        window_size=4, drop_path_rate=0.0, frontend=frontend)
    adapter = AdapterConfig(reduction_factor=2, num_tokens=4)
    return AVEModelConfig(swin=swin, htsat=htsat, adapter=adapter, num_frames=2)


def test_paired_layout_structure():
    cfg = AVEModelConfig()
    layout = ave_paired_layout(cfg.swin, cfg.htsat)
    # 12 paired blocks total: 2 + 2 + 6 + 2
    paired = [e for stage in layout for e in stage if e[2] is not None]
    assert len(paired) == 12
    # stage 2: audio blocks at visual indices 2,5,8,11,14,17 (net_trans.py:885)
    s2 = layout[2]
    audio_pos = [vb for (vb, ab, ai) in s2 if ab is not None]
    assert audio_pos == [2, 5, 8, 11, 14, 17]
    assert len(s2) == 18


def test_adapter_dims_full_config():
    cfg = AVEModelConfig()
    dims = ave_adapter_dims(cfg.swin, cfg.htsat)
    assert len(dims) == 12
    # stage 0: vis (192, 48*48), audio (96, 64*64)
    assert dims[0] == (192, 2304, 96, 4096)
    assert dims[-1] == (1536, 36, 768, 64)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_tiny_forward_eval(tiny_model):
    cfg, params, state = tiny_model
    B, T = 2, cfg.num_frames
    wave = jnp.asarray(np.random.RandomState(0).randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32))
    imgs = jnp.asarray(np.random.RandomState(1).rand(B, T, 64, 64, 3).astype(np.float32))
    out, new_state = ave.forward(params, state, wave, imgs, cfg, train=False)
    assert out["is_event_scores"].shape == (B, T)
    assert out["event_scores"].shape == (B, 28)
    assert out["av_gate"].shape == (B, T)
    assert out["av_score"].shape == (B, 28)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_tiny_forward_train_updates_bn(tiny_model):
    cfg, params, state = tiny_model
    B, T = 2, cfg.num_frames
    wave = jnp.zeros((B, T, cfg.htsat.frontend.clip_samples))
    imgs = jnp.zeros((B, T, 64, 64, 3))
    out, new_state = ave.forward(params, state, wave, imgs, cfg, train=True,
                                 rng=jax.random.PRNGKey(3))
    # bn0 running stats must have moved
    before = np.asarray(state["htsat"]["bn0"]["count"])
    after = np.asarray(new_state["htsat"]["bn0"]["count"])
    assert after == before + 1


def test_tiny_forward_jit_compiles(tiny_model):
    cfg, params, state = tiny_model
    B, T = 1, cfg.num_frames
    wave = jnp.zeros((B, T, cfg.htsat.frontend.clip_samples))
    imgs = jnp.zeros((B, T, 64, 64, 3))

    @jax.jit
    def f(p, s, w, i):
        return ave.forward(p, s, w, i, cfg, train=False)

    out, _ = f(params, state, wave, imgs)
    assert out["event_scores"].shape == (B, 28)


def test_zero_gates_mean_adapters_inert_at_init(tiny_model):
    """gate / gate_av are zero-init (net_trans.py:461,490): at init, the
    adapter residuals must be exactly zero, so the towers run as if frozen."""
    cfg, params, state = tiny_model
    from dg_sct_tpu.models import adapter as A
    p = params["adapters"]["v_p1"][0]
    s = state["adapters"]["v_p1"][0]
    # tiny stage-0 dims: vis tokens 16x16=256@16ch, audio 8x8=64@8ch
    x = jnp.asarray(np.random.RandomState(2).randn(2, 256, 16).astype(np.float32))
    other = jnp.asarray(np.random.RandomState(3).randn(2, 64, 8).astype(np.float32))
    res, maps, _ = A.adapter(p, s, x, other, cfg.adapter, train=False)
    assert np.allclose(np.asarray(res), 0.0)
    assert maps.shape == (2, 1, 256)


@pytest.mark.slow
def test_drop_path_active_in_training():
    """Stochastic depth (net_trans.py:894,903; htsat dpr) fires under train
    rng and is inert at eval. Params are dpr-independent, so the same tree
    runs under both configs."""
    from dg_sct_tpu.models import interleave as I

    cfg0 = tiny_cfg()
    swin_dp = dataclasses.replace(cfg0.swin, drop_path_rate=0.5)
    htsat_dp = dataclasses.replace(cfg0.htsat, drop_path_rate=0.5)
    cfg_dp = dataclasses.replace(cfg0, swin=swin_dp, htsat=htsat_dp)

    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg0)
    rs = np.random.RandomState(0)
    N = 2
    wave = jnp.asarray(rs.randn(N, cfg0.htsat.frontend.clip_samples).astype(np.float32))
    imgs = jnp.asarray(rs.rand(N, 64, 64, 3).astype(np.float32))
    rng = jax.random.PRNGKey(7)

    out0, _ = I.forward(params, state, wave, imgs, cfg0, train=True, rng=rng)
    out_dp, _ = I.forward(params, state, wave, imgs, cfg_dp, train=True, rng=rng)
    # same rng -> same SpecAugment; only drop_path differs between configs
    assert np.max(np.abs(np.asarray(out0["f_v"]) - np.asarray(out_dp["f_v"]))) > 1e-6

    # deterministic and dpr-independent at eval
    e0, _ = I.forward(params, state, wave, imgs, cfg0, train=False)
    e1, _ = I.forward(params, state, wave, imgs, cfg_dp, train=False)
    np.testing.assert_allclose(np.asarray(e0["f_v"]), np.asarray(e1["f_v"]),
                               atol=0)

    # same train rng twice -> bit-identical (keys are derived, not stateful)
    out_dp2, _ = I.forward(params, state, wave, imgs, cfg_dp, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(out_dp["f_v"]),
                               np.asarray(out_dp2["f_v"]), atol=0)
