"""Activation parity against the REFERENCE'S OWN torch modules.

The goldens in tests/golden/refgold_* were produced by
tests/gen_reference_goldens.py running the actual classes from
/root/reference (net_trans.py:433-674,182-292, mgn.py:107-415,
grouping.py:683-770, net_avst.py:27-262, avs_s4/model/PVT_AVSModel.py:90-315)
with weights/inputs regenerated here bit-exactly via refgold_common.synth.
A failure means dg_sct_tpu's semantics diverge from the reference code
itself — the strongest checkpoint-parity insurance available without the
real `best_82.18.pt`.
"""
import numpy as np
import pytest

from refgold_common import load_census, outputs_path, rebuild_sd, synth, synth_tokens
from dg_sct_tpu.configs import AdapterConfig
from dg_sct_tpu.models import adapter as A
from dg_sct_tpu.models import avqa, avvp, grouping
from dg_sct_tpu.models.heads import ave as ave_heads
from dg_sct_tpu.utils import torch_convert as tc

from gen_reference_goldens import ADAPTER_SPECS


def _load(comp):
    return rebuild_sd(load_census(comp)), np.load(outputs_path(comp))


@pytest.mark.parametrize("comp", sorted(ADAPTER_SPECS))
def test_adapter_matches_reference(comp):
    dim, N, odim, M, groups, tokens, use_bn, use_gate, B = ADAPTER_SPECS[comp]
    sd, gold = _load(comp)
    params, state = tc.convert_adapter(sd, "m", groups=groups)
    cfg = AdapterConfig(reduction_factor=8, num_tokens=tokens,
                        num_conv_group=groups, use_bn=use_bn,
                        use_gate=use_gate,
                        avs_variant=comp.startswith("avs_"))
    x = synth(f"__in__/{comp}/x", (B, dim, N, 1), is_input=True)
    vt = synth(f"__in__/{comp}/vt", (B, odim, M, 1), is_input=True)
    out, maps, _ = A.adapter(params, state,
                             x[:, :, :, 0].transpose(0, 2, 1),
                             vt[:, :, :, 0].transpose(0, 2, 1),
                             cfg, train=False)
    ref_out = gold["out"][:, :, :, 0].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(maps), gold["maps"],
                               rtol=2e-4, atol=2e-6)


def test_temporal_attention_matches_reference():
    sd, gold = _load("ave_temporal_attention")
    params = tc.convert_temporal_attention(sd, pre="m")
    f_v = synth("__in__/ave_ta/f_v", (3, 10, 1536), is_input=True)
    f_a = synth("__in__/ave_ta/f_a", (3, 10, 768), is_input=True)
    v_out, a_out, gate = ave_heads.temporal_attention(params, f_v, f_a,
                                                      train=False)
    np.testing.assert_allclose(np.asarray(v_out), gold["v_out"],
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(a_out), gold["a_out"],
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gate), gold["gate"],
                               rtol=2e-4, atol=5e-5)


def test_cmbs_matches_reference():
    sd, gold = _load("ave_cmbs")
    params = tc.convert_cmbs(sd, pre="m")
    v = synth("__in__/ave_cmbs/v", (10, 3, 256), is_input=True)
    a = synth("__in__/ave_cmbs/a", (10, 3, 256), is_input=True)
    is_ev, ev, av = ave_heads.cmbs(params, v, a)
    np.testing.assert_allclose(np.asarray(is_ev), gold["is_event"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ev), gold["event"],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(av), gold["av"],
                               rtol=2e-4, atol=2e-5)


def test_slim_temporal_attention_matches_reference():
    sd, gold = _load("avvp_slim_temporal_attention")
    params = tc.convert_slim_temporal_attention(sd, pre="m")
    f_v = synth("__in__/avvp_ta/f_v", (3, 10, 128), is_input=True)
    f_a = synth("__in__/avvp_ta/f_a", (3, 10, 128), is_input=True)
    v_out, a_out = avvp.slim_temporal_attention(params, f_v, f_a)
    np.testing.assert_allclose(np.asarray(v_out), gold["v_out"],
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(a_out), gold["a_out"],
                               rtol=2e-4, atol=5e-5)


@pytest.mark.parametrize("use_han", [False, True])
def test_modality_trans_matches_reference(use_han):
    comp = "avvp_modality_trans_han" if use_han else "avvp_modality_trans"
    tag = "avvp_mt_han" if use_han else "avvp_mt"
    sd, gold = _load(comp)
    params = tc.convert_modality_trans(sd, "m", depth=3, use_han=use_han)
    x = synth(f"__in__/{tag}/x", (3, 10, 128), is_input=True)
    gt = synth(f"__in__/{tag}/gt", (25, 128), is_input=True)
    xo = synth(f"__in__/{tag}/xo", (3, 10, 128), is_input=True) if use_han else None
    out, _, x_attn = grouping.modality_trans(params, x, gt, num_heads=8,
                                             x_other=xo, hard=False,
                                             gumbel=False, train=False)
    np.testing.assert_allclose(np.asarray(out), gold["out"],
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(x_attn), gold["x_attn"],
                               rtol=2e-4, atol=5e-5)


def test_qst_encoder_matches_reference():
    sd, gold = _load("avqa_qst_encoder")
    params = tc.convert_qst_encoder(sd, pre="m")
    q = synth_tokens("__in__/avqa_qst/q", (3, 14), 93)
    feat = avqa.qst_encoder(params, q.astype(np.int32))
    np.testing.assert_allclose(np.asarray(feat), gold["feat"],
                               rtol=2e-4, atol=5e-5)
