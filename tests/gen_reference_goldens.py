"""Generate activation goldens from the REFERENCE'S OWN torch modules.

VERDICT r4 #2: checkpoint key censuses prove structural parity, but nothing
proved the framework NUMERICALLY against the reference's own classes (the
`transformers` mirrors cover the frozen towers only).  This script imports the
real `VisualAdapter` / `TemporalAttention` / `CMBS` / `QstEncoder` /
`ModalityTrans` from `/root/reference` (third-party deps stubbed exactly as in
tests/gen_key_census.py), fills them with tensors every machine can regenerate
bit-exactly (tests/refgold_common.synth), runs eval-mode forwards, and commits
key-censuses + outputs to tests/golden/refgold_*.  tests/test_reference_golden.py
then asserts dg_sct_tpu matches through utils/torch_convert on any machine,
reference tree or not.

Covered reference code:
  AVE   net_trans.py:433-674 (VisualAdapter, audio+visual flag sets),
        net_trans.py:182-251 (TemporalAttention), :254-292 (CMBS)
  AVVP  mgn.py:162-415 (VisualAdapter), :107-159 (slim TemporalAttention),
        grouping.py:683-770 (ModalityTrans, with and without HAN)
  AVQA  net_avst.py:27-235 (VisualAdapter), :238-262 (QstEncoder)
  AVS   avs_s4/model/PVT_AVSModel.py:90-300 (VisualAdapter — the variant with
        fc-first + bicubic token resampling and no ln_before in the live path)

Usage (needs /root/reference):  python tests/gen_reference_goldens.py
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from refgold_common import save_component, synth, synth_tokens  # noqa: E402


def load_synth(module, prefix="m"):
    """Fill `module` with refgold_common.synth tensors; return the census."""
    import torch
    sd = module.state_dict()
    new = {}
    census = {}
    for k, v in sd.items():
        arr = synth(f"{prefix}.{k}", tuple(v.shape))
        new[k] = torch.from_numpy(arr).to(v.dtype)
        census[f"{prefix}.{k}"] = {"shape": list(v.shape)}
    module.load_state_dict(new)
    module.eval()
    return census


# Adapter geometries: stage-2-like dims; every token count a perfect square
# (the AVS variant bicubic-resamples on the sqrt grid).
ADAPTER_SPECS = {
    # (input_dim, N_self, other_dim, M_other, groups, tokens, use_bn, use_gate, B)
    "ave_adapter_audio": (384, 256, 768, 144, 2, 32, True, True, 4),
    "ave_adapter_visual": (768, 144, 384, 256, 2, 32, True, True, 4),
    "avvp_adapter_audio": (384, 256, 768, 144, 2, 32, True, True, 10),
    "avqa_adapter_audio": (384, 256, 768, 144, 4, 2, False, False, 4),
    "avqa_adapter_visual": (768, 144, 384, 256, 4, 2, False, True, 4),
    "avs_adapter_audio": (384, 256, 768, 144, 2, 32, False, False, 10),
    "avs_adapter_visual": (768, 144, 384, 256, 2, 32, False, True, 10),
}


def _adapter_opt(groups, tokens):
    return argparse.Namespace(
        is_multimodal=1, is_before_layernorm=1, is_post_layernorm=1,
        num_conv_group=groups, num_tokens=tokens, is_fusion_before=1)


def gen_adapter(comp, cls, *, has_num_tk, needs_caption=False):
    import torch
    dim, N, odim, M, groups, tokens, use_bn, use_gate, B = ADAPTER_SPECS[comp]
    opt = _adapter_opt(groups, tokens)
    kw = dict(input_dim=dim, output_dim=dim, adapter_kind="bottleneck",
              dim_list=None, layer_idx=0, reduction_factor=8, opt=opt,
              use_bn=use_bn, use_gate=use_gate,
              conv_dim_in=M, conv_dim_out=N, linear_in=odim, linear_out=dim)
    if has_num_tk:
        kw["num_tk"] = tokens
    with torch.no_grad():
        mod = cls(**kw)
        census = load_synth(mod)
        # layouts as called from the task forward (e.g. net_trans.py:891-892):
        # x = tokens (B, C, N, 1); vis_token = other tower (B, D, M, 1)
        x = torch.from_numpy(synth(f"__in__/{comp}/x", (B, dim, N, 1),
                                   is_input=True))
        vt = torch.from_numpy(synth(f"__in__/{comp}/vt", (B, odim, M, 1),
                                    is_input=True))
        args = (x, vt, None) if needs_caption else (x, vt)
        out, maps = mod(*args)
    save_component(comp, census, {"out": out.numpy(), "maps": maps.numpy()})


def gen_ave():
    sys.path.insert(0, "/root/reference/DG-SCT/AVE")
    from gen_key_census import install_stubs
    install_stubs()
    import torch
    from nets.net_trans import CMBS, TemporalAttention, VisualAdapter

    gen_adapter("ave_adapter_audio", VisualAdapter, has_num_tk=True)
    gen_adapter("ave_adapter_visual", VisualAdapter, has_num_tk=True)

    with torch.no_grad():
        ta = TemporalAttention()
        census = load_synth(ta)
        f_v = torch.from_numpy(synth("__in__/ave_ta/f_v", (3, 10, 1536),
                                     is_input=True))
        f_a = torch.from_numpy(synth("__in__/ave_ta/f_a", (3, 10, 768),
                                     is_input=True))
        v_out, a_out, gate = ta(f_v, f_a)
    save_component("ave_temporal_attention", census,
                   {"v_out": v_out.numpy(), "a_out": a_out.numpy(),
                    "gate": gate.numpy()})

    with torch.no_grad():
        cm = CMBS(argparse.Namespace())
        census = load_synth(cm)
        v = torch.from_numpy(synth("__in__/ave_cmbs/v", (10, 3, 256),
                                   is_input=True))
        a = torch.from_numpy(synth("__in__/ave_cmbs/a", (10, 3, 256),
                                   is_input=True))
        is_ev, ev, av = cm(v, a)
    save_component("ave_cmbs", census,
                   {"is_event": is_ev.numpy(), "event": ev.numpy(),
                    "av": av.numpy()})


def gen_avvp():
    sys.path.insert(0, "/root/reference/DG-SCT/AVVP")
    from gen_key_census import install_stubs
    install_stubs()
    import torch
    from nets.grouping import ModalityTrans
    from nets.mgn import TemporalAttention, VisualAdapter

    gen_adapter("avvp_adapter_audio", VisualAdapter, has_num_tk=True,
                needs_caption=True)

    with torch.no_grad():
        ta = TemporalAttention()
        census = load_synth(ta)
        f_v = torch.from_numpy(synth("__in__/avvp_ta/f_v", (3, 10, 128),
                                     is_input=True))
        f_a = torch.from_numpy(synth("__in__/avvp_ta/f_a", (3, 10, 128),
                                     is_input=True))
        v_out, a_out = ta(f_v, f_a)
    save_component("avvp_slim_temporal_attention", census,
                   {"v_out": v_out.numpy(), "a_out": a_out.numpy()})

    def mk_mt(use_han):
        return ModalityTrans(
            128, depth=3, num_heads=8, mlp_ratio=4., qkv_bias=True,
            qk_scale=None, drop=0., attn_drop=0., drop_path=0.1,
            norm_layer=torch.nn.LayerNorm, out_dim_grouping=128,
            num_heads_grouping=8, num_group_tokens=25, num_output_groups=25,
            hard_assignment=False, use_han=use_han)

    with torch.no_grad():
        mt = mk_mt(False)
        census = load_synth(mt)
        x = torch.from_numpy(synth("__in__/avvp_mt/x", (3, 10, 128),
                                   is_input=True))
        gt = torch.from_numpy(synth("__in__/avvp_mt/gt", (25, 128),
                                    is_input=True))
        out, _, x_attn = mt(x, gt)
    save_component("avvp_modality_trans", census,
                   {"out": out.numpy(), "x_attn": x_attn.numpy()})

    with torch.no_grad():
        mt = mk_mt(True)
        census = load_synth(mt)
        x = torch.from_numpy(synth("__in__/avvp_mt_han/x", (3, 10, 128),
                                   is_input=True))
        gt = torch.from_numpy(synth("__in__/avvp_mt_han/gt", (25, 128),
                                    is_input=True))
        xo = torch.from_numpy(synth("__in__/avvp_mt_han/xo", (3, 10, 128),
                                    is_input=True))
        out, _, x_attn = mt(x, gt, x_other=xo)
    save_component("avvp_modality_trans_han", census,
                   {"out": out.numpy(), "x_attn": x_attn.numpy()})


def gen_avqa():
    sys.path.insert(0, "/root/reference/DG-SCT/AVQA/net_grd_avst")
    from gen_key_census import install_stubs
    install_stubs()
    import torch
    from net_avst import QstEncoder, VisualAdapter

    gen_adapter("avqa_adapter_audio", VisualAdapter, has_num_tk=False)
    gen_adapter("avqa_adapter_visual", VisualAdapter, has_num_tk=False)

    with torch.no_grad():
        qe = QstEncoder(93, 1536, 1536, 1, 1536)
        census = load_synth(qe)
        q = torch.from_numpy(synth_tokens("__in__/avqa_qst/q", (3, 14), 93))
        feat = qe(q)
    save_component("avqa_qst_encoder", census, {"feat": feat.numpy()})


def gen_avs():
    sys.path.insert(0, "/root/reference/DG-SCT/AVS/avs_scripts/avs_s4")
    from gen_key_census import install_stubs
    install_stubs()
    from model.PVT_AVSModel import VisualAdapter

    gen_adapter("avs_adapter_audio", VisualAdapter, has_num_tk=False)
    gen_adapter("avs_adapter_visual", VisualAdapter, has_num_tk=False)


TASKS = {"ave": gen_ave, "avvp": gen_avvp, "avqa": gen_avqa, "avs": gen_avs}


def main():
    import subprocess
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=list(TASKS) + ["all"], default="all")
    ns, _ = p.parse_known_args()
    if ns.task != "all":
        return TASKS[ns.task]()
    # fresh subprocess per task: the task dirs shadow the same module names
    me = os.path.abspath(__file__)
    rc = 0
    for t in TASKS:
        r = subprocess.run([sys.executable, me, "--task", t],
                           capture_output=True, text=True, timeout=1800)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            rc = 1
            print(f"--task {t} FAILED:\n{r.stderr[-3000:]}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
