"""AVS model structural tests (tiny config) + TPAVI / FPN / loss units."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_sct_tpu.configs import AVSModelConfig, AdapterConfig
from dg_sct_tpu.models import avs, tpavi as TP
from dg_sct_tpu.train import avs_train
from tests.test_ave_model import tiny_cfg


def tiny_avs_cfg():
    base = tiny_cfg()
    # mirror the AVS flag structure (base_options is_bn=0/is_gate=0, visual
    # gate hardcoded True) at tiny dims
    return AVSModelConfig(swin=base.swin, htsat=base.htsat,
                          adapter=AdapterConfig(reduction_factor=2, num_tokens=4,
                                                use_bn=False, use_gate=False),
                          adapter_vis=AdapterConfig(reduction_factor=2, num_tokens=4,
                                                    use_bn=False, use_gate=True),
                          num_frames=2, channel=32, mask_size=64,
                          # FPN requires each scale to be exactly 2x the next
                          # (FeatureFusionBlock upsamples by 2 into the skip)
                          scale_sizes=(16, 8, 4, 2), tpavi_stages=(0, 3))


def test_tpavi_identity_at_init():
    """W_z BN scale is zero-init (TPAVI.py:62) -> block ~= LayerNorm(x)."""
    params, state = TP.init_tpavi(jax.random.PRNGKey(0), 16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4, 16).astype(np.float32))
    audio = jnp.asarray(np.random.RandomState(1).randn(2, 3, 8).astype(np.float32))
    z, a, _ = TP.tpavi(params, state, x, audio, train=False)
    assert z.shape == x.shape
    assert a.shape == (2, 3, 16)
    # zero-scaled BN means residual branch contributes only its (zero-init) bias
    mu = np.mean(np.asarray(x), axis=-1, keepdims=True)
    sd = np.std(np.asarray(x), axis=-1, keepdims=True)
    expect = (np.asarray(x) - mu) / np.sqrt(sd ** 2 + 1e-5)
    np.testing.assert_allclose(np.asarray(z), expect, atol=1e-4)


def test_fpn_upsamples():
    p = avs.init_feature_fusion_block(jax.random.PRNGKey(0), 8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 7, 8).astype(np.float32))
    y = avs.feature_fusion_block(p, x)
    assert y.shape == (2, 14, 14, 8)
    skip = jnp.asarray(np.random.RandomState(1).randn(2, 7, 7, 8).astype(np.float32))
    y2 = avs.feature_fusion_block(p, x, skip)
    assert y2.shape == (2, 14, 14, 8)


def test_bilinear_resize_matches_torch():
    import torch
    from dg_sct_tpu.ops import dsp
    x = np.random.RandomState(0).randn(2, 7, 7, 3).astype(np.float32)
    ours = np.asarray(dsp.resize_2d(jnp.asarray(x), 14, 14, kernel="linear",
                                    align_corners=True))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(ours - ref)) < 1e-5

    ours = np.asarray(dsp.resize_2d(jnp.asarray(x), 14, 14, kernel="cubic",
                                    align_corners=False))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(14, 14),
        mode="bicubic", align_corners=False).numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(ours - ref)) < 1e-4


@pytest.mark.slow
def test_tiny_avs_forward_and_loss():
    cfg = tiny_avs_cfg()
    params, state = avs.init_avs_model(jax.random.PRNGKey(0), cfg)
    B, T = 1, cfg.num_frames
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(B, T, 64, 64, 3).astype(np.float32))
    wave = jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32))
    out, new_state = avs.forward(params, state, imgs, wave, cfg, train=False)
    assert out["pred"].shape == (B * T, 64, 64, 1)
    assert len(out["feature_map_list"]) == 4
    assert out["a_fea_list"][0] is not None and out["a_fea_list"][1] is None
    assert np.isfinite(np.asarray(out["pred"])).all()

    mask = jnp.asarray((rs.rand(B, 64, 64, 1) > 0.5).astype(np.float32))
    loss = avs_train.f1_iou_bce_loss(out["pred"], mask, num_frames=T)
    assert np.isfinite(float(loss))
    loss_sa = avs_train.iou_semantic_aware_loss(
        out, mask, lambda_1=0.5, count_stages=(0,), sa_loss_flag=True, num_frames=T)
    assert np.isfinite(float(loss_sa))

    masks_all = jnp.asarray((rs.rand(B * T, 64, 64, 1) > 0.5).astype(np.float32))
    loss_ms3 = avs_train.f5_iou_bce_loss(out["pred"], masks_all)
    assert np.isfinite(float(loss_ms3))


def test_avs_metrics():
    from dg_sct_tpu.train.metrics import f_measure, mask_iou
    rs = np.random.RandomState(0)
    gt = (rs.rand(4, 32, 32) > 0.5).astype(np.float32)
    assert mask_iou(gt, gt) == pytest.approx(1.0)
    assert f_measure(gt, gt) > 0.95
    assert mask_iou(1 - gt, gt) < 0.1


def test_ms3_kl_loss_torch_parity():
    """masked_av_kl_loss vs an independent torch implementation of
    `avs_ms3/loss.py:24-79` (kl_flag, norm_fea, avg pooling, threshold off)."""
    import torch
    import torch.nn.functional as TF

    rs = np.random.RandomState(7)
    BT, H, W, C, Hm = 4, 4, 4, 8, 16
    pred = rs.randn(BT, Hm, Hm, 1).astype(np.float32)
    a_fea = rs.randn(2, 2, C).astype(np.float32)         # (B, T, C)
    v_map = rs.randn(BT, H, W, C).astype(np.float32)

    ours = float(avs_train.masked_av_kl_loss(
        jnp.asarray(pred), [jnp.asarray(a_fea)], [jnp.asarray(v_map)], (0,)))

    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))    # (BT, 1, Hm, Hm)
    ta = torch.from_numpy(a_fea).view(-1, C)
    tv = torch.from_numpy(v_map.transpose(0, 3, 1, 2))   # (BT, C, H, W)
    down = torch.nn.AdaptiveAvgPool2d((H, W))(tp)
    down = torch.sigmoid(down)
    masked_v = (tv * down).mean(-1).mean(-1)
    ta = TF.normalize(ta, dim=-1)
    masked_v = TF.normalize(masked_v, dim=-1)
    ref = TF.kl_div(masked_v.softmax(dim=-1).log(), ta.softmax(dim=-1),
                    reduction="sum")
    assert ours == pytest.approx(float(ref), abs=1e-5)


def test_s4_masked_av_loss_torch_parity():
    """masked_av_simm_loss vs an independent torch implementation of
    `avs_s4/loss.py:31-79` (sigmoid -> pool -> threshold -> object-mean)."""
    import torch
    import torch.nn.functional as TF

    rs = np.random.RandomState(11)
    BT, H, W, C, Hm = 4, 4, 4, 8, 16
    pred = rs.randn(BT, Hm, Hm, 1).astype(np.float32)
    a_fea = rs.randn(2, 2, C).astype(np.float32)
    v_map = rs.randn(BT, H, W, C).astype(np.float32)

    ours = float(avs_train.masked_av_simm_loss(
        jnp.asarray(pred), [jnp.asarray(a_fea)], [jnp.asarray(v_map)], (0,)))

    tp = torch.sigmoid(torch.from_numpy(pred.transpose(0, 3, 1, 2)))
    ta = torch.from_numpy(a_fea).view(-1, C)
    tv = torch.from_numpy(v_map.transpose(0, 3, 1, 2))
    down = (torch.nn.AdaptiveAvgPool2d((H, W))(tp) > 0.5).float()
    obj = down.sum(-1).sum(-1)
    masked_v = (tv * down).sum(-1).sum(-1) / (obj + 1e-6)
    ta = TF.normalize(ta, dim=-1)
    masked_v = TF.normalize(masked_v, dim=-1)
    cos = TF.relu((masked_v * ta).sum(-1)) + 1e-6
    ref = (-cos.log()).mean()
    assert ours == pytest.approx(float(ref), abs=1e-5)


def test_save_masks(tmp_path):
    """save_mask png dump (utility.py:122-147): thresholded P-mode pngs under
    <base>/<category>/<video>/."""
    from PIL import Image

    from dg_sct_tpu.train.metrics import save_masks

    rs = np.random.RandomState(0)
    pred = rs.rand(2 * 5, 16, 16)  # 2 videos x 5 frames
    save_masks(pred, str(tmp_path), ["guitar", "drum"], ["v0", "v1"],
               num_frames=5)
    p = tmp_path / "guitar" / "v0" / "v0_3.png"
    assert p.exists()
    arr = np.asarray(Image.open(p))
    assert set(np.unique(arr)) <= {0, 255}
    np.testing.assert_array_equal(arr > 0, pred[3] > 0.5)
    assert (tmp_path / "drum" / "v1" / "v1_0.png").exists()
