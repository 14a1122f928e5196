"""Feature-extractor backbones (`models/video_feats.py`) vs hand-rolled torch
replicas of the torchvision blocks (torchvision itself is absent from this
environment — the replicas below ARE the torchvision module definitions,
transcribed from its published architecture)."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from dg_sct_tpu.models import video_feats as VF


def torch_bottleneck(inplanes, planes, stride):
    down = None
    if stride != 1 or inplanes != planes * 4:
        down = nn.Sequential(nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                             nn.BatchNorm2d(planes * 4))

    class B(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = down

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + idn)

    return B()


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, (nn.BatchNorm2d, nn.BatchNorm3d)):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.normal_(1, 0.1)
            mod.bias.data.normal_(0, 0.1)


def test_resnet_bottleneck_layer_matches_torch():
    """One full downsampling bottleneck (the repeated unit of resnet152)
    against the torch replica, random weights + running stats."""
    torch.manual_seed(0)
    blk = torch_bottleneck(64, 32, stride=2).eval()
    _randomize_bn(blk)
    state = {f"layer1.0.{k}": v for k, v in blk.state_dict().items()}
    # minimal fake resnet: stem + this single block
    state.update({"conv1.weight": torch.randn(64, 3, 7, 7) * 0.05})
    stem_bn = nn.BatchNorm2d(64).eval()
    _randomize_bn(stem_bn)
    state.update({f"bn1.{k}": v for k, v in stem_bn.state_dict().items()
                  if "num_batches" not in k})

    # convert just the pieces through the converter helpers
    p = {"conv1": VF._conv_from_torch(state, "conv1.weight"),
         "bn1": VF._bn_from_torch(state, "bn1"),
         "blk": {"conv1": VF._conv_from_torch(state, "layer1.0.conv1.weight"),
                 "bn1": VF._bn_from_torch(state, "layer1.0.bn1"),
                 "conv2": VF._conv_from_torch(state, "layer1.0.conv2.weight"),
                 "bn2": VF._bn_from_torch(state, "layer1.0.bn2"),
                 "conv3": VF._conv_from_torch(state, "layer1.0.conv3.weight"),
                 "bn3": VF._bn_from_torch(state, "layer1.0.bn3"),
                 "down_conv": VF._conv_from_torch(state, "layer1.0.downsample.0.weight"),
                 "down_bn": VF._bn_from_torch(state, "layer1.0.downsample.1")}}

    x = np.random.RandomState(0).randn(2, 16, 16, 64).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = blk(xt).numpy().transpose(0, 2, 3, 1)

    blkp = p["blk"]
    y = jax.nn.relu(VF._bn(blkp["bn1"], VF._c2d(blkp["conv1"], jnp.asarray(x))))
    y = jax.nn.relu(VF._bn(blkp["bn2"], VF._c2d(blkp["conv2"], y, stride=2, pad=1)))
    y = VF._bn(blkp["bn3"], VF._c2d(blkp["conv3"], y))
    idn = VF._bn(blkp["down_bn"], VF._c2d(blkp["down_conv"], jnp.asarray(x), stride=2))
    ours = np.asarray(jax.nn.relu(y + idn))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


class TorchR2Plus1dStemBlock(nn.Module):
    """torchvision VideoResNet stem + one R(2+1)D basic block (layer2.0,
    inplanes 64 -> planes 128, stride 2) — transcribed module structure."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False),
            nn.BatchNorm3d(45), nn.ReLU(inplace=True),
            nn.Conv3d(45, 64, (3, 1, 1), 1, (1, 0, 0), bias=False),
            nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        inplanes, planes, stride = 64, 128, 2
        mid = (inplanes * planes * 27) // (inplanes * 9 + 3 * planes)

        def c2p1(cin, cout, s):
            return nn.Sequential(
                nn.Conv3d(cin, mid, (1, 3, 3), (1, s, s), (0, 1, 1), bias=False),
                nn.BatchNorm3d(mid), nn.ReLU(inplace=True),
                nn.Conv3d(mid, cout, (3, 1, 1), (s, 1, 1), (1, 0, 0), bias=False))

        self.conv1 = nn.Sequential(c2p1(inplanes, planes, stride),
                                   nn.BatchNorm3d(planes), nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(c2p1(planes, planes, 1),
                                   nn.BatchNorm3d(planes))
        self.downsample = nn.Sequential(
            nn.Conv3d(inplanes, planes, 1, (stride,) * 3, bias=False),
            nn.BatchNorm3d(planes))

    def forward(self, x):
        x = self.stem(x)
        idn = self.downsample(x)
        return torch.relu(self.conv2(self.conv1(x)) + idn)


def test_r2plus1d_stem_block_matches_torch():
    torch.manual_seed(1)
    m = TorchR2Plus1dStemBlock().eval()
    _randomize_bn(m)
    sd = {k: v for k, v in m.state_dict().items()}

    p = {"stem_s": VF._conv3d_from_torch(sd, "stem.0.weight"),
         "stem_bn_s": VF._bn_from_torch(sd, "stem.1"),
         "stem_t": VF._conv3d_from_torch(sd, "stem.3.weight"),
         "stem_bn_t": VF._bn_from_torch(sd, "stem.4")}
    blk = {"conv1_s": VF._conv3d_from_torch(sd, "conv1.0.0.weight"),
           "bn1_s": VF._bn_from_torch(sd, "conv1.0.1"),
           "conv1_t": VF._conv3d_from_torch(sd, "conv1.0.3.weight"),
           "bn1": VF._bn_from_torch(sd, "conv1.1"),
           "conv2_s": VF._conv3d_from_torch(sd, "conv2.0.0.weight"),
           "bn2_s": VF._bn_from_torch(sd, "conv2.0.1"),
           "conv2_t": VF._conv3d_from_torch(sd, "conv2.0.3.weight"),
           "bn2": VF._bn_from_torch(sd, "conv2.1"),
           "down_conv": VF._conv3d_from_torch(sd, "downsample.0.weight"),
           "down_bn": VF._bn_from_torch(sd, "downsample.1")}

    x = np.random.RandomState(1).randn(1, 8, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy() \
            .transpose(0, 2, 3, 4, 1)

    h = VF._c3d(p["stem_s"], jnp.asarray(x), (1, 2, 2), (0, 3, 3))
    h = jax.nn.relu(VF._bn(p["stem_bn_s"], h))
    h = VF._c3d(p["stem_t"], h, (1, 1, 1), (1, 0, 0))
    h = jax.nn.relu(VF._bn(p["stem_bn_t"], h))
    idn = VF._bn(blk["down_bn"], VF._c3d(blk["down_conv"], h, (2, 2, 2), (0, 0, 0)))
    y = jax.nn.relu(VF._bn(blk["bn1"], VF._conv2plus1d(blk, 1, h, 2)))
    y = VF._bn(blk["bn2"], VF._conv2plus1d(blk, 2, y, 1))
    ours = np.asarray(jax.nn.relu(y + idn))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_full_backbones_run_and_extract(tmp_path):
    """Smoke: full-depth init + forward shapes, and the extraction pipeline
    writes per-video npy files with the script's shapes."""
    p = VF.init_r2plus1d_18(jax.random.PRNGKey(0))
    feats = VF.r2plus1d_18_features(p, jnp.zeros((1, 8, 32, 32, 3)))
    assert feats.shape == (1, 512)

    from PIL import Image
    vdir = tmp_path / "frames" / "vid0"
    vdir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(16):
        Image.fromarray((rs.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            vdir / f"{i:04d}.jpg")
    from dg_sct_tpu.data import feature_extract as FE
    FE.extract_3d_feats(str(tmp_path / "frames"), str(tmp_path / "out3d"),
                        n_frame_steps=16, img_size=32)
    out = np.load(tmp_path / "out3d" / "vid0.npy")
    assert out.shape == (2, 512)


def test_resnet152_full_runs():
    p = VF.init_resnet152(jax.random.PRNGKey(0))
    f = VF.resnet152_features(p, jnp.zeros((1, 64, 64, 3)))
    assert f.shape == (1, 2048)
    assert np.isfinite(np.asarray(f)).all()
