"""Checkpoint-import dress rehearsal against the EXACT key census of the
reference checkpoints.

`tests/golden/census_best_82_18.json` / `census_htsat_audioset.json` hold
every key+shape+dtype of `best_82.18.pt` (full `MMIL_Net.state_dict()`,
`DG-SCT/AVE/main_trans.py:298`) and `HTSAT_AudioSet_Saved_1.ckpt`
(strict-loaded at `net_trans.py:740-743`), generated from the reference's
OWN module definitions by `tests/gen_key_census.py` (run where
/root/reference exists; censuses are committed so this test runs anywhere).

Gates (the day the real files land, `tools/import_eval.py` runs the same
gates plus the metric eval):
  1. a synthetic state dict with exactly the census keys/shapes converts
     without KeyError;
  2. every census key is consumed or matches the documented ignore-list
     (`AVE_CKPT_IGNORED_PATTERNS`) — no silent partial import;
  3. the converted pytree equals `init_ave_model`'s tree in structure and
     shape at the shipping full-size `AVEModelConfig` (params AND state).
"""
import json
import os

import jax
import numpy as np
import pytest

from dg_sct_tpu.configs import AVEModelConfig
from dg_sct_tpu.models import ave
from dg_sct_tpu.utils import torch_convert as TC

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def load_census(name):
    path = os.path.join(GOLD, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated (run tests/gen_key_census.py)")
    with open(path) as f:
        return json.load(f)


def synth_sd(census, seed=0):
    """Synthetic values with exactly the census keys/shapes/dtypes."""
    rs = np.random.RandomState(seed)
    sd = {}
    for k, spec in census.items():
        shape, dtype = spec["shape"], np.dtype(spec["dtype"])
        if dtype.kind in "iu":
            sd[k] = np.zeros(shape, dtype)
        elif k.endswith("running_var"):
            sd[k] = (rs.rand(*shape) + 0.5).astype(dtype)
        else:
            sd[k] = (rs.randn(*shape) * 0.05).astype(dtype)
    return sd


def tree_shapes(tree):
    return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def full_init():
    cfg = AVEModelConfig()
    params, state = ave.init_ave_model(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def assert_same_tree(init_tree, conv_tree, what):
    a, b = tree_shapes(init_tree), tree_shapes(conv_tree)
    missing = {k: v for k, v in a.items() if k not in b or b[k] != v}
    extra = {k: v for k, v in b.items() if k not in a or a[k] != v}
    assert not missing, f"{what}: missing/mismatched in converted: " \
                        f"{list(missing.items())[:8]}"
    assert not extra, f"{what}: unexpected in converted: " \
                      f"{list(extra.items())[:8]}"


def test_best_82_18_census_roundtrip(full_init):
    cfg, init_params, init_state = full_init
    census = load_census("census_best_82_18.json")
    sd = TC.track(synth_sd(census))
    params, state = TC.convert_ave_model(sd)

    report = TC.census_report(sd)
    assert not report["unexplained"], (
        f"{len(report['unexplained'])} checkpoint keys neither consumed nor "
        f"on the documented ignore-list: {report['unexplained'][:10]}")
    # the ignore-list must actually hit something real (buffers, swin.head)
    assert len(report["ignored"]) > 100
    assert len(report["consumed"]) > 1500

    assert_same_tree(init_params, params, "params")
    assert_same_tree(init_state, state, "state")


def test_htsat_audioset_census_roundtrip(full_init):
    cfg, init_params, init_state = full_init
    census = load_census("census_htsat_audioset.json")
    # the real file nests under 'sed_model.' (stripped by net_trans.py:741)
    sd = TC.track(TC.strip_prefix(synth_sd(census), "sed_model."))
    params, state = TC.convert_htsat(sd)
    report = TC.census_report(sd)
    assert not report["unexplained"], report["unexplained"][:10]
    assert_same_tree(init_params["htsat"], params, "htsat params")
    assert_same_tree(init_state["htsat"], state, "htsat state")


# ---------------------------------------------------------------------------
# Other task families: AVVP / AVS / AVQA (censuses generated from the
# reference's own module definitions with each task's shipping flags —
# tests/gen_key_census.py mirrors train.sh + base_options defaults)
# ---------------------------------------------------------------------------

def init_shapes(init_fn):
    """Shape-only init via eval_shape (full-size towers are too heavy to
    materialize once per family on CPU)."""
    return jax.eval_shape(init_fn, jax.random.PRNGKey(0))


def tree_shapes_abstract(tree):
    return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def assert_same_tree_abstract(init_tree, conv_tree, what):
    a = tree_shapes_abstract(init_tree)
    b = {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in
         jax.tree_util.tree_flatten_with_path(conv_tree)[0]}
    missing = {k: v for k, v in a.items() if k not in b or b[k] != v}
    extra = {k: v for k, v in b.items() if k not in a or a[k] != v}
    assert not missing, f"{what}: missing/mismatched in converted: " \
                        f"{list(missing.items())[:8]}"
    assert not extra, f"{what}: unexpected in converted: " \
                      f"{list(extra.items())[:8]}"


def test_avvp_census_roundtrip():
    from dg_sct_tpu.configs import AVVPModelConfig
    from dg_sct_tpu.models import avvp
    census = load_census("census_avvp_mgn.json")
    sd = TC.track(synth_sd(census))
    params, state = TC.convert_avvp_model(sd)
    report = TC.census_report(sd, TC.AVVP_CKPT_IGNORED_PATTERNS)
    assert not report["unexplained"], report["unexplained"][:10]
    assert len(report["ignored"]) > 100       # masks, buffers, dead modules
    cfg = AVVPModelConfig()
    init_p, init_s = init_shapes(lambda k: avvp.init_avvp_model(k, cfg))
    assert_same_tree_abstract(init_p, params, "avvp params")
    assert_same_tree_abstract(init_s, state, "avvp state")


def test_avvp_htsat_census_matches_ave():
    """AVVP strict-loads the same HTSAT_AudioSet_Saved_1.ckpt as AVE
    (AVVP/nets/mgn.py mirrors net_trans.py:740-743) — the censuses generated
    from the two vendored htsat.py copies must be identical."""
    a = load_census("census_htsat_audioset.json")
    b = load_census("census_htsat_audioset_avvp.json")
    assert a == b


def test_avs_census_roundtrip():
    from dg_sct_tpu.configs import AVSModelConfig
    from dg_sct_tpu.models import avs
    from dg_sct_tpu.models import pvt
    census = load_census("census_avs_s4.json")
    # AVS-flag sanity: base_options is_bn=0/is_gate=0 — the census must NOT
    # carry adapter bn keys, and only the VISUAL adapters carry `gate`
    assert "audio_adapter_blocks_p1.0.bn1.weight" not in census
    assert "audio_adapter_blocks_p1.0.gate" not in census
    assert "vis_adapter_blocks_p1.0.gate" in census
    sd = TC.track(synth_sd(census))
    params, state, pvt_params = TC.convert_avs_model(sd)
    report = TC.census_report(sd, TC.AVS_CKPT_IGNORED_PATTERNS)
    assert not report["unexplained"], report["unexplained"][:10]
    cfg = AVSModelConfig()
    init_p, init_s = init_shapes(lambda k: avs.init_avs_model(k, cfg))
    assert_same_tree_abstract(init_p, params, "avs params")
    assert_same_tree_abstract(init_s, state, "avs state")
    init_pvt = init_shapes(lambda k: pvt.init_pvt_v2(k))
    assert pvt_params is not None
    assert_same_tree_abstract(init_pvt, pvt_params, "pvt params")


def test_avs_pvt_imagenet_census_roundtrip():
    """The standalone ImageNet pvt_v2_b5.pth (loaded at
    PVT_AVSModel.py:968-977) converts fully on its own."""
    from dg_sct_tpu.models import pvt
    census = load_census("census_avs_pvt_v2_b5.json")
    sd = TC.track(synth_sd(census))
    params = TC.convert_pvt_v2(sd)
    report = TC.census_report(sd, ignored=())
    assert not report["unexplained"], report["unexplained"][:10]
    init_pvt = init_shapes(lambda k: pvt.init_pvt_v2(k))
    assert_same_tree_abstract(init_pvt, params, "pvt params")


def test_avqa_fusion_census_roundtrip():
    from dg_sct_tpu.configs import AVQAModelConfig
    from dg_sct_tpu.models import avqa
    census = load_census("census_avqa_fusion.json")
    # AVQA-flag sanity: is_bn=0, audio is_gate=0, vis gate hardcoded True,
    # num_tokens=2, num_conv_group=4 (net_grd_avst/base_options.py:70-81)
    assert "audio_adapter_blocks_p1.0.bn1.weight" not in census
    assert "audio_adapter_blocks_p1.0.gate" not in census
    assert "vis_adapter_blocks_p1.0.gate" in census
    assert census["audio_adapter_blocks_p1.0.my_tokens"]["shape"][0] == 2
    sd = TC.track(synth_sd(census))
    params, state = TC.convert_avqa_fusion(sd)
    report = TC.census_report(sd, TC.AVQA_CKPT_IGNORED_PATTERNS)
    assert not report["unexplained"], report["unexplained"][:10]
    cfg = AVQAModelConfig()
    init_p, init_s = init_shapes(lambda k: avqa.init_avqa_model(k, cfg))
    assert_same_tree_abstract(init_p, params, "avqa params")
    assert_same_tree_abstract(init_s, state, "avqa state")


def test_avqa_grounding_census_roundtrip():
    from dg_sct_tpu.configs import AVQAModelConfig
    from dg_sct_tpu.models import avqa_grounding
    census = load_census("census_avqa_grounding.json")
    sd = TC.track(synth_sd(census))
    params, state = TC.convert_avqa_grounding(sd)
    report = TC.census_report(sd, TC.AVQA_GROUNDING_CKPT_IGNORED_PATTERNS)
    assert not report["unexplained"], report["unexplained"][:10]
    cfg = AVQAModelConfig()
    init_p, init_s = init_shapes(
        lambda k: avqa_grounding.init_grounding_model(k, cfg))
    assert_same_tree_abstract(init_p, params, "grounding params")
    assert_same_tree_abstract(init_s, state, "grounding state")


def test_import_eval_task_flag(tmp_path):
    """`import_eval --task avqa_grounding` consumes a torch-saved fake
    checkpoint with the exact census and passes its gates."""
    torch = pytest.importorskip("torch")
    census = load_census("census_avqa_grounding.json")
    sd = {k: torch.from_numpy(v) for k, v in synth_sd(census).items()}
    pt = tmp_path / "lavish_grounding_gen_best.pt"
    torch.save(sd, str(pt))
    from dg_sct_tpu.tools.import_eval import main as ie_main
    out_npz = tmp_path / "grd.npz"
    ie_main(["--task", "avqa_grounding", "--ckpt", str(pt),
             "--census-only", "--save", str(out_npz)])
    assert out_npz.exists()


def test_import_eval_census_gate(tmp_path, full_init):
    """End-to-end: the one-command harness consumes a torch-saved fake
    best_82.18.pt with the exact census and passes its census+shape gates."""
    torch = pytest.importorskip("torch")
    census = load_census("census_best_82_18.json")
    sd = {k: torch.from_numpy(v) for k, v in synth_sd(census).items()}
    pt = tmp_path / "best_82.18.pt"
    torch.save(sd, str(pt))

    from dg_sct_tpu.tools.import_eval import main as ie_main
    out_npz = tmp_path / "converted.npz"
    ie_main(["--ave-ckpt", str(pt), "--census-only",
             "--save", str(out_npz)])
    assert out_npz.exists()
    from dg_sct_tpu.utils import checkpoint as ckpt_lib
    params, state = ckpt_lib.load_params_and_state(str(out_npz))
    assert_same_tree(full_init[1], params, "roundtripped params")
