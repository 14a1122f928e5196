"""Native IO core vs PIL golden reference."""
import io
import os

import numpy as np
import pytest

from dg_sct_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native io core unavailable")

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _pil_ref(img, size):
    from PIL import Image
    r = np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC),
                   np.float32) / 255.0
    return (r - MEAN) / STD


def test_resize_normalize_matches_pil_downscale():
    rs = np.random.RandomState(0)
    img = (rs.rand(356, 473, 3) * 255).astype(np.uint8)
    ours = native.resize_normalize(img, 192, MEAN, STD)
    ref = _pil_ref(img, 192)
    assert ours.shape == ref.shape
    # PIL uses fixed-point uint8 intermediates; allow quantization tolerance
    assert np.abs(ours - ref).max() < 0.08
    assert np.abs(ours - ref).mean() < 0.01


def test_resize_normalize_matches_pil_upscale():
    rs = np.random.RandomState(1)
    img = (rs.rand(96, 128, 3) * 255).astype(np.uint8)
    ours = native.resize_normalize(img, 224, MEAN, STD)
    ref = _pil_ref(img, 224)
    assert np.abs(ours - ref).max() < 0.08


def test_jpeg_batch(tmp_path):
    from PIL import Image
    rs = np.random.RandomState(2)
    paths = []
    for i in range(6):
        img = (rs.rand(200, 300, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    batch = native.load_jpeg_batch(paths, 192, MEAN, STD)
    assert batch.shape == (6, 192, 192, 3)
    assert np.isfinite(batch).all()
    # compare one image against PIL decode + resize (JPEG lossy: loose tol)
    img = np.asarray(Image.open(paths[0]).convert("RGB"))
    ref = _pil_ref(img, 192)
    assert np.abs(batch[0] - ref).mean() < 0.02


def test_jpeg_batch_u8(tmp_path):
    """The fast uint8 path (DCT-scaled decode + device-side normalize) must
    agree with the float path after on-host normalization — small pixel
    deviation allowed (decode runs at m/8 DCT scale before the resize)."""
    from PIL import Image
    rs = np.random.RandomState(3)
    paths = []
    for i in range(4):
        # smooth image: DCT-scaled decode differences stay small
        base = rs.rand(20, 30, 3)
        img = np.asarray(Image.fromarray(
            (base * 255).astype(np.uint8)).resize((480, 320), Image.BICUBIC))
        p = str(tmp_path / f"g{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    u8 = native.load_jpeg_batch_u8(paths, 192)
    assert u8.shape == (4, 192, 192, 3) and u8.dtype == np.uint8
    ref = native.load_jpeg_batch(paths, 192, MEAN, STD)
    ours = (u8.astype(np.float32) / 255.0 - MEAN) / STD
    assert np.abs(ours - ref).mean() < 0.05


def test_normalize_frames_u8_matches_host():
    import jax.numpy as jnp
    from dg_sct_tpu.ops.basic import normalize_frames_u8
    rs = np.random.RandomState(4)
    u8 = (rs.rand(2, 8, 8, 3) * 255).astype(np.uint8)
    dev = np.asarray(normalize_frames_u8(jnp.asarray(u8), dtype=jnp.float32))
    host = (u8.astype(np.float32) / 255.0 - MEAN) / STD
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_jpeg_batch_yuv420_roundtrip(tmp_path):
    """Half-payload YUV420 ingest: planar decode + device-side reconstruction
    (`normalize_frames_yuv420`) must match the u8 RGB path on smooth content
    (the chroma loss is the 4:2:0 subsampling already present in source
    JPEGs); grayscale must be bit-exact (Cb=Cr=128 exactly)."""
    import jax.numpy as jnp
    from PIL import Image
    from dg_sct_tpu.ops.basic import normalize_frames_u8, normalize_frames_yuv420
    xx, yy = np.meshgrid(np.linspace(0, 1, 320), np.linspace(0, 1, 320))
    smooth = np.stack([xx, yy, 0.5 + 0.3 * np.sin(4 * xx)], -1)
    gray = np.repeat(xx[..., None], 3, -1)
    paths = []
    for i, img in enumerate([smooth, gray]):
        p = str(tmp_path / f"y{i}.jpg")
        Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=95)
        paths.append(p)
    y, uv = native.load_jpeg_batch_yuv420(paths, 192)
    assert y.shape == (2, 192, 192) and uv.shape == (2, 96, 96, 2)
    assert y.dtype == uv.dtype == np.uint8
    ref = np.asarray(normalize_frames_u8(
        native.load_jpeg_batch_u8(paths, 192), dtype=jnp.float32))
    rec = np.asarray(normalize_frames_yuv420(y, uv, dtype=jnp.float32))
    err = np.abs(ref - rec)
    assert err[0].mean() < 0.02, err[0].mean()    # smooth color
    assert err[1].max() < 1e-5, err[1].max()      # grayscale bit-exact


def test_mulaw_roundtrip():
    """mu-law u8 audio wire format: device inverse must reconstruct the
    waveform at ~38 dB SNR, and the downstream log-mel drift must stay
    within the serving tolerance used for the bf16 STFT path."""
    import jax.numpy as jnp
    from dg_sct_tpu.ops.basic import encode_mulaw_u8, dequantize_mulaw_u8
    rs = np.random.RandomState(7)
    wave = (rs.randn(2, 32000) * 0.1).astype(np.float32)
    dec = np.asarray(dequantize_mulaw_u8(encode_mulaw_u8(wave)))
    snr = 10 * np.log10(np.mean(wave ** 2) / np.mean((wave - dec) ** 2))
    assert snr > 32.0, snr
    # i16 sources take the same path (differences bounded by ONE mu-law bin
    # — i16 rounding can flip the companded u8 bin)
    w16 = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
    dec16 = np.asarray(dequantize_mulaw_u8(encode_mulaw_u8(w16)))
    assert np.abs(dec16 - dec).max() < 0.02

    from dg_sct_tpu.configs import AudioFrontendConfig
    from dg_sct_tpu.ops import dsp
    cfg = AudioFrontendConfig()
    exact = dsp.logmel(dsp.power_spectrogram(jnp.asarray(wave), cfg), cfg)
    quant = dsp.logmel(dsp.power_spectrogram(jnp.asarray(dec), cfg), cfg)
    db_err = np.percentile(np.abs(np.asarray(exact) - np.asarray(quant)), 99)
    assert db_err < 1.0, f"mu-law log-mel p99 drift {db_err:.3f} dB"
