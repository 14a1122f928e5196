"""Int8 frozen-tower quantization (ops/quant.py): exactness bounds for the
linear path and end-to-end logit agreement on the tiny AVE model."""
import numpy as np
import jax
import jax.numpy as jnp

from dg_sct_tpu.models import ave
from dg_sct_tpu.ops import quant
from dg_sct_tpu.ops.basic import linear

from test_ave_model import tiny_cfg


def test_linear_int8_matches_fp_within_quant_error():
    rs = np.random.RandomState(0)
    p = {"kernel": jnp.asarray(rs.randn(256, 512).astype(np.float32) * 0.05),
         "bias": jnp.asarray(rs.randn(512).astype(np.float32) * 0.1)}
    x = jnp.asarray(rs.randn(8, 49, 256).astype(np.float32))
    y_fp = linear(p, x)
    y_q = linear(quant.quantize_linear(p), x)
    # symmetric 8-bit on both operands: relative error ~ 1e-2 on gaussian data
    rel = np.linalg.norm(np.asarray(y_q - y_fp)) / np.linalg.norm(np.asarray(y_fp))
    assert rel < 0.02, rel


def test_quantize_tree_filters_skinny_linears():
    rs = np.random.RandomState(1)
    tree = {
        "fat": {"kernel": jnp.asarray(rs.randn(256, 256).astype(np.float32))},
        "cpb_fc1": {"kernel": jnp.asarray(rs.randn(2, 512).astype(np.float32))},
        "nested": [{"fc": {"kernel": jnp.asarray(rs.randn(192, 768).astype(np.float32)),
                           "bias": jnp.zeros((768,))}}],
    }
    q = quant.quantize_tree(tree, min_dim=192)
    assert "kernel_q" in q["fat"] and q["fat"]["kernel_q"].dtype == jnp.int8
    assert "kernel" in q["cpb_fc1"]          # skinny: untouched
    assert "kernel_q" in q["nested"][0]["fc"] and "bias" in q["nested"][0]["fc"]


def test_window_attention_v2_int8_core_matches_fp():
    """The int8 cosine-attention core (static 1/127 scales on unit-norm q/k
    and [0,1] softmax probs, dynamic per-channel v scales) must track the fp
    core closely — quantized qkv/proj weights are held identical so only the
    attention-core quantization contributes drift."""
    from dg_sct_tpu.ops import windows as W

    rs = np.random.RandomState(3)
    dim, heads, ws = 64, 4, 4
    p = W.attention_v2_init(jax.random.PRNGKey(0), dim, heads)
    # realistic magnitudes: trained logit_scale ~ log(10) (the init)
    x = jnp.asarray(rs.randn(6, ws * ws, dim).astype(np.float32) * 0.5)
    y_fp = W.window_attention_v2(p, x, num_heads=heads, ws=ws)

    pq = dict(p)
    pq["qkv"] = quant.quantize_linear(p["qkv"])
    # reference with the SAME dequantized qkv weights so the weight-quant
    # error cancels; the remaining drift is the int8 qkv activation quant
    # (dynamic per-row) plus the int8 attention core itself
    dq_kernel = (pq["qkv"]["kernel_q"].astype(jnp.float32)
                 * pq["qkv"]["kscale"][None, :])
    y_fp_qw = W.window_attention_v2({**p, "qkv": {"kernel": dq_kernel}},
                                    x, num_heads=heads, ws=ws)
    W.set_int8_attn(True)
    try:
        y_q = W.window_attention_v2(pq, x, num_heads=heads, ws=ws)
    finally:
        W.set_int8_attn(False)
    rel = (np.linalg.norm(np.asarray(y_q - y_fp_qw))
           / np.linalg.norm(np.asarray(y_fp_qw)))
    assert rel < 0.03, rel
    # and the full path (weight quant + core quant) stays near the fp result
    rel_full = (np.linalg.norm(np.asarray(y_q - y_fp))
                / np.linalg.norm(np.asarray(y_fp)))
    assert rel_full < 0.05, rel_full


def test_ave_forward_int8_towers_agree():
    """Quantizing the frozen towers must preserve eval predictions on the tiny
    model: same argmax event class per frame and small logit drift."""
    cfg = tiny_cfg()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(2)
    wave = jnp.asarray(rs.randn(2, cfg.num_frames,
                                cfg.htsat.frontend.clip_samples).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rs.rand(2, cfg.num_frames, cfg.swin.img_size,
                               cfg.swin.img_size, 3).astype(np.float32))

    out_fp, _ = ave.forward(params, state, wave, imgs, cfg, train=False)
    qparams = quant.quantize_eval_params(params, min_dim=16)  # tiny dims: low bar
    out_q, _ = ave.forward(qparams, state, wave, imgs, cfg, train=False)

    a = np.asarray(out_fp["event_scores"], np.float32)
    b = np.asarray(out_q["event_scores"], np.float32)
    # logits drift bounded; randomly-initialized net => logits are near-flat,
    # so compare drift against the logit spread rather than argmax
    denom = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() / denom < 0.25, np.abs(a - b).max() / denom

    # static-scale path: calibrate on the same batch, re-quantize, and check
    # it tracks the dynamic-scale result (per-tensor static scales are
    # coarser — same drift bound vs full precision)
    scales = quant.calibrate_ave(params, state, cfg, wave, imgs, min_dim=16)
    assert len(scales) > 0 and all(v > 0 for v in scales.values())
    sparams = quant.quantize_eval_params(params, min_dim=16, act_scales=scales)
    out_s, _ = ave.forward(sparams, state, wave, imgs, cfg, train=False)
    c = np.asarray(out_s["event_scores"], np.float32)
    assert np.isfinite(c).all()
    assert np.abs(a - c).max() / denom < 0.3, np.abs(a - c).max() / denom


def test_ave_forward_int8_adapters_agree():
    """The towers+adapters serving config: the adapter stack's fat affines AND
    its stage-1 token_resample/chan_align GEMMs (routed through
    adapter._token_linear) go int8 too (static in serving), and the logit
    drift stays bounded — calibrated static scales included (the bench
    BENCH_INT8_ADAPTERS path)."""
    cfg = tiny_cfg()
    towers = ("swin", "htsat", "adapters")
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(5)
    wave = jnp.asarray(rs.randn(2, cfg.num_frames,
                                cfg.htsat.frontend.clip_samples).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rs.rand(2, cfg.num_frames, cfg.swin.img_size,
                               cfg.swin.img_size, 3).astype(np.float32))
    out_fp, _ = ave.forward(params, state, wave, imgs, cfg, train=False)

    qparams = quant.quantize_eval_params(params, towers=towers, min_dim=16)
    for ad in qparams["adapters"]["v_p1"]:
        assert "kernel_q" in ad["aff_video_1"]       # fat affine quantized
        # stage-1 GEMMs quantize when both dims clear min_dim (else stay fp)
        for key in ("token_resample", "chan_align"):
            k = ad[key].get("kernel", ad[key].get("kernel_q"))
            expect = "kernel_q" if min(k.shape) >= 16 else "kernel"
            assert expect in ad[key], (key, k.shape)
        assert ad["down"]["kernel"].ndim == 3        # grouped conv untouched
    out_q, _ = ave.forward(qparams, state, wave, imgs, cfg, train=False)
    a = np.asarray(out_fp["event_scores"], np.float32)
    b = np.asarray(out_q["event_scores"], np.float32)
    denom = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() / denom < 0.3, np.abs(a - b).max() / denom

    # calibrated static-scale path: tower qids must stay a stable prefix so
    # tower-only scale files remain valid, and adapter linears get scales too
    scales_t = quant.calibrate_ave(params, state, cfg, wave, imgs, min_dim=16)
    scales = quant.calibrate_ave(params, state, cfg, wave, imgs,
                                 towers=towers, min_dim=16)
    assert len(scales) > len(scales_t)
    for qid, v in scales_t.items():
        assert np.isclose(scales[qid], v, rtol=1e-5), (qid, v, scales[qid])
    sparams = quant.quantize_eval_params(params, towers=towers, min_dim=16,
                                         act_scales=scales)
    assert "ascale" in sparams["adapters"]["v_p1"][0]["aff_video_1"]
    out_s, _ = ave.forward(sparams, state, wave, imgs, cfg, train=False)
    c = np.asarray(out_s["event_scores"], np.float32)
    assert np.isfinite(c).all()
    assert np.abs(a - c).max() / denom < 0.35, np.abs(a - c).max() / denom


def test_scale_file_fingerprint_roundtrip(tmp_path):
    """save_scales/load_scales: a qid->shape fingerprint mismatch (model edit
    shifted the calibration walk) must invalidate the file instead of
    silently assigning scales to the wrong layers."""
    import os
    p = str(tmp_path / "s.json")
    scales = {0: 1.5, 1: 0.25}
    shapes = {0: (256, 512), 1: (512, 256)}
    quant.save_scales(p, scales, shapes)
    assert quant.load_scales(p, shapes) == scales
    assert quant.load_scales(p) == scales                       # no check
    assert quant.load_scales(p, {0: (256, 512), 1: (512, 999)}) is None
    assert quant.load_scales(p, {0: (256, 512)}) is None
    # legacy flat format: qid-count check only
    import json
    with open(p, "w") as f:
        json.dump({"0": 1.5, "1": 0.25}, f)
    assert quant.load_scales(p, shapes) == scales
    assert quant.load_scales(p, {0: (256, 512)}) is None


def test_avs_forward_int8_towers_agree():
    """int8 generalizes to the second serving family: calibrate_avs records
    static activation scales through the AVS forward (note its images-first
    arg order) and the quantized mask logits stay bounded vs fp."""
    from dg_sct_tpu.models import avs
    from test_avs_model import tiny_avs_cfg

    cfg = tiny_avs_cfg()
    params, state = avs.init_avs_model(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(6)
    wave = jnp.asarray(rs.randn(2, cfg.num_frames,
                                cfg.htsat.frontend.clip_samples)
                       .astype(np.float32) * 0.1)
    imgs = jnp.asarray(rs.rand(2, cfg.num_frames, cfg.mask_size,
                               cfg.mask_size, 3).astype(np.float32))
    out_fp, _ = avs.forward(params, state, imgs, wave, cfg, train=False)

    scales = quant.calibrate_avs(params, state, cfg, wave, imgs, min_dim=16)
    assert scales and all(v > 0 for v in scales.values())
    qparams = quant.quantize_eval_params(params, min_dim=16,
                                         act_scales=scales)
    out_q, _ = avs.forward(qparams, state, imgs, wave, cfg, train=False)
    a = np.asarray(out_fp["pred"], np.float32)
    b = np.asarray(out_q["pred"], np.float32)
    denom = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() / denom < 0.3, np.abs(a - b).max() / denom


def test_avvp_avqa_calibrate_and_int8_agree():
    """int8 static-scale towers cover the remaining two families: the
    calibrators record nonzero scales through each forward and the quantized
    heads' outputs stay bounded vs fp."""
    from dg_sct_tpu.models import avvp, avqa
    from test_avvp_model import tiny_avvp_cfg
    from test_avqa_model import tiny_avqa_cfg

    rs = np.random.RandomState(7)

    pcfg = tiny_avvp_cfg()
    pp, ps = avvp.init_avvp_model(jax.random.PRNGKey(0), pcfg)
    w = jnp.asarray(rs.randn(2, pcfg.num_frames,
                             pcfg.htsat.frontend.clip_samples)
                    .astype(np.float32) * 0.1)
    im = jnp.asarray(rs.rand(2, pcfg.num_frames, pcfg.swin.img_size,
                             pcfg.swin.img_size, 3).astype(np.float32))
    st = jnp.asarray(rs.randn(2, pcfg.num_frames, 512).astype(np.float32))
    fp, _ = avvp.forward(pp, ps, w, im, st, pcfg, train=False)
    scales = quant.calibrate_avvp(pp, ps, pcfg, w, im, st, min_dim=16)
    assert scales and all(v > 0 for v in scales.values())
    qp = quant.quantize_eval_params(pp, min_dim=16, act_scales=scales)
    q, _ = avvp.forward(qp, ps, w, im, st, pcfg, train=False)
    a, b = (np.asarray(fp["global_prob"], np.float32),
            np.asarray(q["global_prob"], np.float32))
    assert np.abs(a - b).max() < 0.3  # probs in [0, 25]

    qcfg = tiny_avqa_cfg()
    qpp, qps = avqa.init_avqa_model(jax.random.PRNGKey(1), qcfg)
    qw = jnp.asarray(rs.randn(2, qcfg.num_frames,
                              qcfg.htsat.frontend.clip_samples)
                     .astype(np.float32) * 0.1)
    qim = jnp.asarray(rs.rand(2, qcfg.num_frames, qcfg.swin.img_size,
                              qcfg.swin.img_size, 3).astype(np.float32))
    qq = jnp.asarray(rs.randint(0, qcfg.qst_vocab_size,
                                size=(2, 14)).astype(np.int32))
    fpq, _ = avqa.forward(qpp, qps, qw, qim, qim, qq, qcfg, train=False)
    qscales = quant.calibrate_avqa(qpp, qps, qcfg, qw, qim, qq, min_dim=16)
    assert qscales and all(v > 0 for v in qscales.values())
    qqp = quant.quantize_eval_params(qpp, min_dim=16, act_scales=qscales)
    qout, _ = avqa.forward(qqp, qps, qw, qim, qim, qq, qcfg, train=False)
    a, b = (np.asarray(fpq["out_qa"], np.float32),
            np.asarray(qout["out_qa"], np.float32))
    denom = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() / denom < 0.3, np.abs(a - b).max() / denom
