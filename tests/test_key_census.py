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
