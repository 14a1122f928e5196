"""Kaldi-fbank path (`data/fbank.py`) — the AVE loader's dormant _wav2fbank
equivalent. torchaudio is absent from this environment, so parity is
algorithmic: shape law, mel-peak placement, normalization/padding semantics
(reference: DG-SCT/AVE/dataloader.py:92-151)."""
import numpy as np
import pytest

from dg_sct_tpu.data import fbank as FB


def test_frame_count_law():
    # snip_edges: m = 1 + (n - window) // shift; 16k, 25ms/5.2ms -> 400/83
    wave = np.random.RandomState(0).randn(16000).astype(np.float32)
    fb = FB.kaldi_fbank(wave)
    assert fb.shape == (1 + (16000 - 400) // 83, 192)
    assert np.isfinite(fb).all()
    assert FB.kaldi_fbank(np.zeros(100)).shape == (0, 192)


def test_mel_banks_partition():
    banks = FB.kaldi_mel_banks(192, 512, 16000)
    assert banks.shape == (192, 256)
    assert (banks >= 0).all() and (banks <= 1.0 + 1e-6).all()
    # interior fft bins are covered by at least one filter
    covered = banks.sum(0)
    lo = int(np.ceil(20 / (16000 / 512))) + 2
    assert (covered[lo:250] > 0).all()


def test_pure_tone_peaks_at_matching_mel_bin():
    sr, f0 = 16000, 1000.0
    t = np.arange(sr) / sr
    fb = FB.kaldi_fbank(np.sin(2 * np.pi * f0 * t))
    mean_spec = fb.mean(axis=0)
    peak = int(mean_spec.argmax())
    # expected bin: mel position of f0 within [mel(20), mel(nyquist)]
    mel = lambda f: 1127.0 * np.log(1 + f / 700.0)
    frac = (mel(f0) - mel(20)) / (mel(8000) - mel(20))
    expected = int(frac * 193) - 1
    assert abs(peak - expected) <= 2


def test_wav2fbank_shape_norm_and_segments():
    rs = np.random.RandomState(1)
    wave = rs.randn(16000 * 11).astype(np.float32)  # > 10s: segment sampling
    f0 = FB.wav2fbank(wave, idx=0)
    f9 = FB.wav2fbank(wave, idx=9)
    assert f0.shape == (192, 192) and f9.shape == (192, 192)
    assert not np.allclose(f0, f9)  # different linspace segments
    # un-normalize: a silent wave's fbank rows are log(eps) exactly. The last
    # rows are zero-padded AFTER normalization (dataloader.py:140-146), so
    # check only the real frames (m = 1 + (16000-400)//83 = 188).
    silent = FB.wav2fbank(np.zeros(16000), idx=None)
    raw = silent[:188] * (FB.AVE_NORM_STD * 2) + FB.AVE_NORM_MEAN
    assert raw.max() <= np.log(1.2e-7) + 1e-4
    assert np.allclose(silent[188:], 0.0)


def test_wav2fbank_mixup():
    rs = np.random.RandomState(2)
    w1, w2 = rs.randn(16000), rs.randn(16000)
    mixed = FB.wav2fbank(w1, wave2=w2, mix_lambda=0.5)
    assert mixed.shape == (192, 192)
    pure = FB.wav2fbank(w1)
    assert not np.allclose(mixed, pure)


def test_avs_audio_log_mel_roundtrip(tmp_path):
    import pickle
    import torch
    from dg_sct_tpu.data.avs import load_audio_log_mel
    t = torch.randn(5, 1, 96, 64)
    p = tmp_path / "v.pkl"
    with open(p, "wb") as f:
        pickle.dump(t, f)
    arr = load_audio_log_mel(str(p))
    assert arr.shape == (5, 1, 96, 64)
    np.testing.assert_allclose(arr, t.numpy(), atol=1e-6)
