"""Audio DSP frontend: wave -> power spectrogram -> log-mel -> mel "image".

TPU-first design: every stage is a dense matmul against a precomputed constant
matrix, so the whole frontend compiles to three MXU matmuls fused with
elementwise ops — no FFT primitives, no gathers, no dynamic shapes:

  frames  = conv_patches(wave)                  # (N, T, n_fft)
  power   = (frames @ Wcos)^2 + (frames @ Wsin)^2   # windowed DFT as matmul
  logmel  = 10*log10(clamp(power @ Mel, amin))
  image   = fold(logmel @ Interp^T)             # bicubic T-resize as matmul

Reference behavior: torchlibrosa `Spectrogram`/`LogmelFilterBank` built at
`DG-SCT/AVE/nets/htsat.py:443-449` (n_fft 1024, hop 320, hann, center=True,
reflect pad, power 2, slaney mel, ref=1, amin=1e-10, top_db=None) and
`reshape_wav2img` (htsat.py:719-734, bicubic align_corners=True).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import AudioFrontendConfig


# ---------------------------------------------------------------------------
# static basis matrices (numpy, computed once per config)
# ---------------------------------------------------------------------------

def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


@functools.lru_cache(maxsize=None)
def dft_basis(n_fft: int):
    """Windowed real-DFT bases: (n_fft, n_fft//2+1) cos and -sin matrices."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    w = hann_window(n_fft)[:, None]
    return (np.cos(ang) * w).astype(np.float32), (-np.sin(ang) * w).astype(np.float32)


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, 1000.0 * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=None)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') transposed to
    (n_fft//2+1, n_mels) — the layout LogmelFilterBank matmuls with."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = mel_to_hz_slaney(np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)


def _cubic_kernel(x, a=-0.75):
    x = np.abs(x)
    return np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


@functools.lru_cache(maxsize=None)
def resize_matrix(n_in: int, n_out: int, *, kernel: str = "cubic",
                  align_corners: bool = True) -> np.ndarray:
    """(n_out, n_in) matrix M with (M @ x) == torch F.interpolate along one
    axis (mode='bicubic'/'bilinear', matching align_corners semantics).

    Separable resampling is linear in the input, so every interpolate in the
    reference (reshape_wav2img htsat.py:726; AVS multi-scale resizes
    PVT_AVSModel.py:908-916; FPN upsamples) becomes baked-constant matmuls —
    exact and MXU-friendly."""
    M = np.zeros((n_out, n_in), np.float64)
    if n_in == n_out and align_corners:
        return np.eye(n_out, dtype=np.float32)
    if align_corners:
        scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        src = np.arange(n_out) * scale
    else:
        scale = n_in / n_out
        src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    if kernel == "cubic":
        taps, kfn = range(-1, 3), _cubic_kernel
    else:  # linear
        taps, kfn = range(0, 2), lambda x: np.maximum(0.0, 1.0 - np.abs(x))
    for tap in taps:
        w = kfn(tap - frac)
        idx = np.clip(i0 + tap, 0, n_in - 1)
        np.add.at(M, (np.arange(n_out), idx), w)
    return M.astype(np.float32)


def bicubic_resize_matrix(n_in: int, n_out: int, align_corners: bool = True) -> np.ndarray:
    return resize_matrix(n_in, n_out, kernel="cubic", align_corners=align_corners)


def resize_2d(x, out_h, out_w, *, kernel="cubic", align_corners=False):
    """Separable torch-compatible resize on (N, H, W, C) via two matmuls.

    Dtype-preserving: the baked basis matrices are cast to x.dtype so a bf16
    activation stays bf16 (float32 inputs keep exact float32 torch parity)."""
    Mh = jnp.asarray(resize_matrix(x.shape[1], out_h, kernel=kernel,
                                   align_corners=align_corners), dtype=x.dtype)
    Mw = jnp.asarray(resize_matrix(x.shape[2], out_w, kernel=kernel,
                                   align_corners=align_corners), dtype=x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", Mh, x)
    return jnp.einsum("ow,nhwc->nhoc", Mw, x)


# ---------------------------------------------------------------------------
# forward ops
# ---------------------------------------------------------------------------

def frame_signal(wave, n_fft, hop):
    """(N, L) -> (N, T, n_fft) frames with center=True reflect padding,
    T = L // hop + 1 (torchlibrosa Spectrogram conv framing)."""
    N, L = wave.shape
    pad = n_fft // 2
    x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None, :], filter_shape=(n_fft,), window_strides=(hop,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))
    # patches: (N, n_fft, T)
    return patches.transpose(0, 2, 1)


def power_spectrogram(wave, cfg: AudioFrontendConfig, compute_dtype=None):
    """(N, L) -> (N, T, n_fft//2+1) power spectrogram |STFT|^2 (f32 out).

    STFT as explicit overlap framing + ONE dense GEMM against the windowed
    DFT basis. Framing is ceil(n_fft/hop) strided views of the hop-chunked
    signal (pure layout ops) — NOT conv_general_dilated_patches and NOT a
    1-input-channel strided conv: both lower to degenerate im2col convs the
    TPU backend runs off the MXU (patches version measured ~28 ms for 40
    clips; the direct-conv version 8.8 ms by knockout — this GEMM form puts
    the 4.3 GFLOP where they belong).

    `compute_dtype=jnp.bfloat16` runs the frame x basis GEMM on the bf16 MXU
    with f32 accumulation (serving fast path; bounded by
    tests/test_dsp.py::test_power_spectrogram_bf16_drift). Default f32 is
    exact vs torchlibrosa (parity-tested)."""
    n_fft, hop = cfg.n_fft, cfg.hop_size
    x = wave.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    N, Lp = x.shape
    T = wave.shape[1] // hop + 1
    k = -(-n_fft // hop)                               # chunks per frame
    need = (T + k - 1) * hop
    if Lp < need:
        x = jnp.pad(x, ((0, 0), (0, need - Lp)))
    chunks = x[:, :need].reshape(N, T + k - 1, hop)
    frames = jnp.stack([chunks[:, j:j + T] for j in range(k)], axis=2)
    frames = frames.reshape(N, T, k * hop)[..., :n_fft]  # (N, T, n_fft)
    wc, ws = dft_basis(n_fft)                          # (n_fft, F) each
    basis = jnp.asarray(np.concatenate([wc, ws], axis=1))
    if compute_dtype is not None:
        frames = frames.astype(compute_dtype)
        basis = basis.astype(compute_dtype)
    y = jax.lax.dot_general(frames, basis, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (N, T, 2F)
    F = wc.shape[1]
    re, im = y[..., :F], y[..., F:]
    return re * re + im * im


def logmel(power, cfg: AudioFrontendConfig):
    """(N, T, F) power -> (N, T, mel) log-mel dB (ref=1, top_db=None)."""
    mel = power @ jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.mel_bins, cfg.fmin, cfg.fmax))
    return 10.0 * jnp.log10(jnp.maximum(mel, cfg.amin))


def reshape_wav2img(x, cfg: AudioFrontendConfig):
    """(N, T, mel) -> (N, spec, spec, 1) mel image.

    Bicubic-resizes T -> spec*freq_ratio via constant matmul, then folds
    `freq_ratio` frequency strips along the row axis (htsat.py:719-734):
    rows = freq_ratio blocks of `mel` bins, cols = time.
    """
    N, T, F = x.shape
    fr = cfg.freq_ratio
    target_t = cfg.target_t
    if T < target_t:
        M = jnp.asarray(bicubic_resize_matrix(T, target_t))
        x = jnp.einsum("ntf,st->nsf", x, M)
    # (N, target_t, F) -> permute to (N, F, target_t) -> split time into
    # (freq_ratio, spec) -> (N, fr*F, spec)
    x = x.transpose(0, 2, 1)                              # (N, F, 4*spec... time)
    x = x.reshape(N, F, fr, target_t // fr)               # (N, F, fr, spec)
    x = x.transpose(0, 2, 1, 3)                           # (N, fr, F, spec)
    x = x.reshape(N, fr * F, target_t // fr)              # (N, spec, spec)
    return x[..., None]                                   # (N, spec, spec, 1)


def crop_mel(x, positions, crop_size: int):
    """Per-example time crop of mel features (htsat.py:707-718 `crop_wav`).

    x: (N, T, F); positions: (N,) int start frames -> (N, crop_size, F).
    The reference loops examples with random/fixed `crop_pos`; here a vmapped
    dynamic slice (the long-clip branch is dormant for DG-SCT's 1-s segments
    — T=1001 < 1024 always takes the interpolate path — but ported for
    standalone-HTSAT completeness)."""
    def one(xi, p):
        return jax.lax.dynamic_slice_in_dim(xi, p, crop_size, axis=0)

    return jax.vmap(one)(x, positions)


def long_clip_eval_positions(T: int):
    """Sliding-crop schedule of the reference's eval long-clip branch
    (htsat.py:804-808): crop (T-1)//2, overlap (T-1)//4."""
    crop = (T - 1) // 2
    overlap = (T - 1) // 4
    return list(range(0, T - crop - 1, overlap)), crop


def spec_augment(rng, x, cfg: AudioFrontendConfig):
    """torchlibrosa SpecAugmentation (htsat.py:451-452): per-example random
    time/freq stripes zeroed. x: (N, T, F)."""
    N, T, F = x.shape

    def stripes(key, total, width, num):
        kw, kb = jax.random.split(key)
        w = jax.random.randint(kw, (N, num), 0, width)
        bgn = (jax.random.uniform(kb, (N, num)) * (total - w)).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (N, num, total), 2)
        hit = (pos >= bgn[..., None]) & (pos < (bgn + w)[..., None])
        return ~jnp.any(hit, axis=1)  # (N, total) keep-mask

    kt, kf = jax.random.split(rng)
    tmask = stripes(kt, T, cfg.time_drop_width, cfg.time_stripes_num)
    fmask = stripes(kf, F, cfg.freq_drop_width, cfg.freq_stripes_num)
    return x * tmask[:, :, None] * fmask[:, None, :]


def do_mixup(x, lam):
    """Mixup against the batch-flipped tensor (`nets/utils.py:143-153`).
    x: (N, ...), lam: (N,)."""
    lam = lam.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    return x * lam + jnp.flip(x, axis=0) * (1.0 - lam)
