"""End-to-end driver integration tests: the REAL-data epoch/eval loops of
every task main, run over tiny synthetic media trees (tiny model configs).

These exercise exactly the code paths a user runs (`--mode train/eval`):
dataset construction from on-disk media, threaded batched iterator, jitted
train/eval steps, metric harnesses, best-checkpoint save and reload.
"""
import json
import os

import numpy as np
import pytest

from tests import media_tree
from tests.test_ave_model import tiny_cfg

pytestmark = pytest.mark.slow

TINY_WAVE = 3200  # tiny frontend: 1 s @ 3200 Hz per segment


def test_avvp_train_loop(tmp_path):
    from dg_sct_tpu.train import avvp_main
    from tests.test_avvp_model import tiny_avvp_cfg

    root = str(tmp_path)
    tree = media_tree.make_llp_tree(root, ["aaaaaaaaaaa_0", "bbbbbbbbbbb_1"],
                                    n_frames=3, img_size=64,
                                    wave_samples=2 * TINY_WAVE)
    argv = ["--mode", "train", "--epochs", "1", "--batch-size", "2",
            "--label-train", os.path.join(root, "AVVP_train.csv"),
            "--label-val", os.path.join(root, "AVVP_val_pd.csv"),
            "--label-test", os.path.join(root, "AVVP_test_pd.csv"),
            "--eval-csv-dir", root,
            "--frames", tree["frames"], "--audio", tree["audio"],
            "--st", tree["st"],
            "--save-dir", os.path.join(root, "ckpt")]
    summary = avvp_main.main(argv, cfg=tiny_avvp_cfg())
    assert set(summary) >= {"segment_type_avg", "event_type_avg"}
    assert all(0.0 <= v <= 100.0 for v in summary.values())
    assert os.path.exists(os.path.join(root, "ckpt", "MGN_Net.npz"))
    # metrics JSONL stream was written
    lines = open(os.path.join(root, "ckpt", "avvp.metrics.jsonl")).read().splitlines()
    events = [json.loads(ln) for ln in lines]
    assert events[0]["event"] == "config"
    assert any(e["event"] == "scalars" and "val/segment_type_avg" in e
               for e in events)


def test_ave_train_loop(tmp_path):
    """The flagship AVE driver's real-data epoch/eval loop end-to-end: media
    tree -> threaded loader -> mixup train steps -> accuracy eval -> best-ckpt
    with full train state."""
    from dg_sct_tpu.train import ave_main

    root = str(tmp_path)
    cfg = tiny_cfg()
    cats = [f"cat{i:02d}" for i in range(28)]  # AVE's 28 fg classes (bg=28)
    tree = media_tree.make_ave_tree(root, [f"av{i}" for i in range(4)], cats,
                                    n_frames=3, img_size=cfg.swin.img_size,
                                    wave_samples=2 * TINY_WAVE)
    argv = ["--mode", "train", "--epochs", "1", "--batch-size", "2",
            "--accum", "1", "--meta", root, "--frames", tree["frames"],
            "--audio", tree["audio"], "--save-dir", os.path.join(root, "ckpt")]
    ave_main.main(argv, cfg=cfg)
    cks = [f for f in os.listdir(os.path.join(root, "ckpt"))
           if f.startswith("best_") and f.endswith(".npz")]
    assert cks, "best checkpoint not saved"
    assert os.path.exists(os.path.join(root, "ckpt", "ave.metrics.jsonl"))
    assert os.path.exists(os.path.join(root, "ckpt", "run_meta.json"))

    # eval mode consumes the saved bundle
    acc = None
    out = ave_main.main(["--mode", "eval", "--meta", root,
                         "--frames", tree["frames"], "--audio", tree["audio"],
                         "--ckpt", os.path.join(root, "ckpt", cks[0])], cfg=cfg)


def test_avs_ms3_train_loop(tmp_path):
    """MS3 real-data loop: all-frame masks + KL masked-AV loss composition."""
    from dg_sct_tpu.train import avs_main
    from tests.test_avs_model import tiny_avs_cfg

    root = str(tmp_path)
    cfg = tiny_avs_cfg()
    for split in ("train", "test"):
        media_tree.make_avs_tree(root, [("guitar", f"v{split}0"),
                                        ("drum", f"v{split}1")],
                                 split=split, n_frames=cfg.num_frames,
                                 img_size=cfg.mask_size,
                                 wave_samples=cfg.num_frames * TINY_WAVE,
                                 mask_frames=cfg.num_frames)
    argv = ["--mode", "train", "--task", "ms3", "--epochs", "1",
            "--batch-size", "2", "--root", root,
            "--save-dir", os.path.join(root, "ckpt")]
    result = avs_main.main(argv, cfg=cfg)
    assert result is not None
    assert 0.0 <= result["miou"] <= 1.0 and 0.0 <= result["f_score"] <= 1.0
    assert os.path.exists(os.path.join(root, "ckpt", "ms3_best.npz"))


def test_avqa_two_stage_loop(tmp_path):
    """Stage-1 grounding loop -> stage-2 fusion loop with weight transfer and
    the 9-type accuracy report."""
    from dg_sct_tpu.train import avqa_main
    from tests.test_avqa_model import tiny_avqa_cfg

    root = str(tmp_path)
    cfg = tiny_avqa_cfg()
    tree = media_tree.make_avqa_tree(root, ["qa0", "qa1"], n_frames=3,
                                     img_size=cfg.swin.img_size,
                                     wave_samples=2 * TINY_WAVE, n_q=4)
    common = ["--meta", root, "--frames", tree["frames"],
              "--audio", tree["audio"], "--batch-size", "2",
              "--epochs", "1", "--save-dir", os.path.join(root, "ckpt")]
    s1_path = avqa_main.main(["--mode", "train", "--stage", "1"] + common,
                             cfg=cfg)
    assert s1_path and os.path.exists(s1_path)
    accs = avqa_main.main(["--mode", "train", "--stage", "2",
                           "--stage1-ckpt", s1_path] + common, cfg=cfg)
    assert "Avg" in accs and 0.0 <= accs["Avg"] <= 100.0
    # per-type buckets from the synthetic types are present
    assert any(k.startswith("Audio-Visual") for k in accs)
    assert os.path.exists(os.path.join(root, "ckpt", "avst_best.npz"))


def _tiny_pretrain_cfg(num_classes):
    from dg_sct_tpu.configs import AdapterConfig, PretrainModelConfig
    from tests.test_pretrain_model import tiny_clip

    base = tiny_cfg()
    ccfg = tiny_clip(vision_layers=sum(base.htsat.depths))
    return PretrainModelConfig(
        clip=ccfg, htsat=base.htsat,
        adapter=AdapterConfig(reduction_factor=2, num_tokens=4),
        num_frames=2, num_classes=num_classes)


def test_pretrain_few_zero_shot_loops(tmp_path):
    """Pretrain on a synthetic VGGSound-AVEL tree, then zero-shot and K-shot
    few-shot on a synthetic AVE tree, all from the saved checkpoint."""
    from dg_sct_tpu.train import few_shot_main, pretrain_main, zero_shot_main

    cats = ["dog barking", "violin", "helicopter"]
    cfg = _tiny_pretrain_cfg(len(cats))

    vgg_root = str(tmp_path / "vgg")
    tree = media_tree.make_vggsound_tree(
        vgg_root, [f"{i:06d}" for i in range(4)], cats, n_frames=3,
        img_size=cfg.clip.image_size, wave_samples=2 * TINY_WAVE)
    argv = ["--mode", "train", "--epochs", "1", "--batch-size", "2",
            "--root", vgg_root, "--frames", tree["frames"],
            "--audio", tree["audio"],
            "--save-dir", os.path.join(vgg_root, "ckpt")]
    ckpt = pretrain_main.main(argv, cfg=cfg, classnames=cats)
    assert ckpt and os.path.exists(ckpt)

    # zero-shot eval on a synthetic AVE tree with the SAME tiny class list
    ave_root = str(tmp_path / "ave")
    os.makedirs(ave_root)
    atree = media_tree.make_ave_tree(ave_root, ["za", "zb"], cats, n_frames=3,
                                     img_size=cfg.clip.image_size,
                                     wave_samples=2 * TINY_WAVE)
    zargv = ["--mode", "eval", "--dataset", "AVE", "--ckpt", ckpt,
             "--meta", ave_root, "--frames", atree["frames"],
             "--audio", atree["audio"], "--batch-size", "2"]
    acc_ev = zero_shot_main.main(zargv, cfg=cfg, classnames=cats)
    acc_cls = zero_shot_main.main(zargv + ["--cls"], cfg=cfg, classnames=cats)
    assert 0.0 <= acc_ev <= 100.0 and 0.0 <= acc_cls <= 100.0

    # few-shot fine-tuning from the pretrain checkpoint (K=1)
    fargv = ["--mode", "train", "--dataset", "AVE", "--k-shot", "1",
             "--epochs", "1", "--batch-size", "2", "--ckpt", ckpt,
             "--meta", ave_root, "--frames", atree["frames"],
             "--audio", atree["audio"],
             "--save-dir", os.path.join(ave_root, "ckpt")]
    best = few_shot_main.main(fargv, cfg=cfg, classnames=cats)
    assert 0.0 <= best <= 100.0
    assert os.path.exists(os.path.join(ave_root, "ckpt",
                                       "few_shot_AVE_cls_best.npz"))

    # event-localization mode (main_AVE.py non-weak): background prompt class
    import dataclasses

    from dg_sct_tpu.configs import PromptConfig
    ev_cfg = dataclasses.replace(cfg, prompt=PromptConfig(weak=False))
    best_ev = few_shot_main.main(fargv + ["--task", "events"], cfg=ev_cfg,
                                 classnames=cats)
    assert 0.0 <= best_ev <= 100.0
