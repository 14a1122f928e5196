"""VGGish audio embedding network.

Rebuild of `avs_scripts/avs_s4/torchvggish/{vggish,vggish_input,mel_features,
vggish_params}.py`. NOTE: the reference *builds* VGGish for AVS
(train.py:56-63) but its features are commented out of the live path
(train.py:245-248) — HTS-AT on raw wave is the live audio branch. Implemented
here for interface completeness, including the 0.96 s / 96x64 log-mel example
frontend and the PCA postprocessor.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import conv2d, conv2d_init, linear, linear_init

# vggish_params.py constants
SAMPLE_RATE = 16000
STFT_WINDOW_S = 0.025
STFT_HOP_S = 0.010
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_S = 0.96   # -> 96 frames of 10 ms
EMBEDDING_SIZE = 128

_CONV_CHANNELS = (64, 128, 256, 256, 512, 512)
_LAYOUT = ((64,), (128,), (256, 256), (512, 512))  # conv blocks between pools


def init_vggish(key, dtype=jnp.float32):
    keys = jax.random.split(key, 10)
    ki = 0
    convs = []
    in_ch = 1
    for block in _LAYOUT:
        for out_ch in block:
            convs.append(conv2d_init(keys[ki], 3, 3, in_ch, out_ch, dtype=dtype))
            in_ch = out_ch
            ki += 1
    return {
        "convs": convs,
        "fc1": linear_init(keys[6], 512 * 4 * 6, 4096, dtype=dtype),
        "fc2": linear_init(keys[7], 4096, 4096, dtype=dtype),
        "fc3": linear_init(keys[8], 4096, EMBEDDING_SIZE, dtype=dtype),
    }


def _max_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def vggish(params, x):
    """x: (N, 96, 64, 1) log-mel examples -> (N, 128) embeddings."""
    ci = 0
    for block in _LAYOUT:
        for _ in block:
            x = jax.nn.relu(conv2d(params["convs"][ci], x))
            ci += 1
        x = _max_pool(x)
    # the reference VGG.forward transposes NCHW -> NHWC before flattening
    # ("remain compatible with vggish embeddings", torchvggish/vggish.py:23-29)
    # — our features are already NHWC, so flatten directly
    N = x.shape[0]
    x = x.reshape(N, -1)
    x = jax.nn.relu(linear(params["fc1"], x))
    x = jax.nn.relu(linear(params["fc2"], x))
    return jax.nn.relu(linear(params["fc3"], x))


@functools.lru_cache(maxsize=None)
def _mel_matrix():
    from ..ops.dsp import hz_to_mel_slaney  # different scale; VGGish uses HTK
    # HTK mel scale (mel_features.py): 1127 * ln(1 + f/700)
    n_fft = 512
    fft_freqs = np.linspace(0, SAMPLE_RATE / 2.0, n_fft // 2 + 1)
    def htk(f):
        return 1127.0 * np.log1p(np.asarray(f) / 700.0)
    mel_edges = np.linspace(htk(MEL_MIN_HZ), htk(MEL_MAX_HZ), NUM_MEL_BINS + 2)
    spec_mel = htk(fft_freqs)
    weights = np.zeros((len(fft_freqs), NUM_MEL_BINS))
    for i in range(NUM_MEL_BINS):
        lo, c, hi = mel_edges[i:i + 3]
        lower = (spec_mel - lo) / (c - lo)
        upper = (hi - spec_mel) / (hi - c)
        weights[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    weights[0, :] = 0.0
    return weights.astype(np.float32)


def waveform_to_examples(wave):
    """(L,) 16 kHz waveform -> (n_examples, 96, 64, 1) log-mel examples
    (vggish_input.py semantics: 25 ms Hann window, 10 ms hop, HTK mel,
    log(mel + 0.01), 0.96 s non-overlapping examples)."""
    win = int(round(SAMPLE_RATE * STFT_WINDOW_S))
    hop = int(round(SAMPLE_RATE * STFT_HOP_S))
    n_fft = 512
    n_frames = 1 + (len(wave) - win) // hop
    if n_frames < 1:
        return jnp.zeros((0, 96, 64, 1))
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = jnp.asarray(wave)[idx] * jnp.asarray(np.hanning(win), jnp.float32)
    frames = jnp.pad(frames, ((0, 0), (0, n_fft - win)))
    spec = jnp.abs(jnp.fft.rfft(frames, n_fft))
    mel = spec @ jnp.asarray(_mel_matrix())
    logmel = jnp.log(mel + LOG_OFFSET)
    ex_frames = int(round(EXAMPLE_WINDOW_S / STFT_HOP_S))       # 96
    n_ex = logmel.shape[0] // ex_frames
    ex = logmel[: n_ex * ex_frames].reshape(n_ex, ex_frames, NUM_MEL_BINS)
    return ex[..., None]


def init_postprocessor(key, dtype=jnp.float32):
    """PCA postprocessor params (vggish.py Postprocessor)."""
    k1, k2 = jax.random.split(key)
    return {"pca_matrix": jax.random.normal(k1, (EMBEDDING_SIZE, EMBEDDING_SIZE), dtype) * 0.1,
            "pca_means": jnp.zeros((EMBEDDING_SIZE,), dtype)}


def postprocess(params, embeddings, quantize=True):
    """PCA + optional 8-bit quantization (vggish.py:Postprocessor.forward)."""
    x = (embeddings - params["pca_means"]) @ params["pca_matrix"].T
    if quantize:
        x = jnp.clip(x, -2.0, 2.0)
        x = (x + 2.0) * (255.0 / 4.0)
        x = jnp.round(x)
    return x
