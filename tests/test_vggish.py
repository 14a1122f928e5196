"""VGGish parity vs an independent torch mirror of the reference network.

Reference: `avs_scripts/avs_s4/torchvggish/{vggish,vggish_input,
vggish_params}.py`. The reference *builds* VGGish for AVS (train.py:56-63)
but comments its features out of the live path (train.py:245-248); these
tests prove the dormant implementation + checkpoint converter are faithful
anyway.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dg_sct_tpu.models import vggish as V
from dg_sct_tpu.utils import torch_convert as tc


def _torch_vggish():
    """Torch mirror of the reference VGG (torchvggish/vggish.py:9-31,
    make_layers :109-120): conv cfg [64,M,128,M,256,256,M,512,512,M],
    3x3/pad1 convs, 2x2 pools, then 12288->4096->4096->128 ReLU MLP, with
    the NCHW->NHWC transpose before flatten (vggish.py:23-29)."""
    import torch.nn as nn

    layers, in_ch = [], 1
    for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"):
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(True)]
            in_ch = v

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128), nn.ReLU(True))

        def forward(self, x):
            x = self.features(x)
            x = x.permute(0, 2, 3, 1).contiguous()  # == the two transposes
            return self.embeddings(x.view(x.size(0), -1))

    return Mirror()


def test_vggish_torch_parity():
    torch.manual_seed(0)
    mirror = _torch_vggish().eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = tc.convert_vggish(sd)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 96, 64, 1).astype(np.float32)  # (N, H, W, 1) log-mel
    with torch.no_grad():
        ref = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(V.vggish(jax.tree_util.tree_map(jnp.asarray, params),
                               jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_vggish_pca_torch_parity():
    """PCA + 8-bit quantization vs the reference Postprocessor math
    (torchvggish/vggish.py:62-104): M @ (e.T - means) then clamp [-2,2],
    round((x+2)*255/4)."""
    rng = np.random.RandomState(2)
    eig = rng.randn(128, 128).astype(np.float32) * 0.3
    means = rng.randn(128, 1).astype(np.float32)
    emb = rng.randn(5, 128).astype(np.float32) * 2.0

    ref = (eig @ (emb.T - means)).T
    ref = np.clip(ref, -2.0, 2.0)
    ref = np.round((ref + 2.0) * (255.0 / 4.0))

    params = tc.convert_vggish_pca({"pca_eigen_vectors": eig,
                                    "pca_means": means})
    ours = np.asarray(V.postprocess(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(emb)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_waveform_to_examples():
    """0.96 s / 96x64 example framing (vggish_input.py:56-75) and HTK-mel
    energy localization: a pure tone's energy lands in the mel bin whose
    center is nearest the tone frequency."""
    sr = V.SAMPLE_RATE
    t = np.arange(2 * sr) / sr
    wave = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    ex = np.asarray(V.waveform_to_examples(wave))
    assert ex.shape[1:] == (96, 64, 1)
    assert ex.shape[0] == 2  # two non-overlapping 0.96 s examples

    mean_spec = ex[0, :, :, 0].mean(axis=0)
    peak = int(np.argmax(mean_spec))
    # HTK mel bin centers over [125, 7500] Hz; 1 kHz should win +-1 bin
    htk = lambda f: 1127.0 * np.log1p(np.asarray(f) / 700.0)
    edges = np.linspace(htk(V.MEL_MIN_HZ), htk(V.MEL_MAX_HZ), 64 + 2)
    centers_hz = 700.0 * (np.expm1(edges[1:-1] / 1127.0))
    expect = int(np.argmin(np.abs(centers_hz - 1000.0)))
    assert abs(peak - expect) <= 1, (peak, expect)
