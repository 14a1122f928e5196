"""Zero-shot evaluation driver — the `zero-shot/zero_shot.py` equivalent.

Modes (README "zero-shot"): AVE event scores (per-segment argmax,
zero_shot.py:154-156), AVE classification and LLP classification (weak
clip-level argmax, zero_shot.py:160-177). Loads a pretrain checkpoint; prompt
prefix/suffix buffers are rebuilt from the eval class list, mirroring
zero_shot.py:92-93's key skip.

Usage:
    python -m dg_sct_tpu.train.zero_shot_main --mode eval --dataset AVE \
        --ckpt pretrain.npz --meta .../data/AVE --frames DIR --audio DIR
    python -m dg_sct_tpu.train.zero_shot_main --mode smoke
"""
from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import PretrainModelConfig
from ..data import ave as ave_data
from ..data import avvp as avvp_data
from ..models import pretrain as PT
from ..utils import checkpoint as ckpt_lib
from ..utils.compile_cache import enable_persistent_cache
from .pretrain_train import (make_pretrain_eval_step, partition_pretrain_params,
                             segment_accuracy, weak_accuracy, zero_shot_accuracy,
                             zero_shot_scores)


def classnames_for(dataset: str, meta_root="/root/reference/data"):
    if dataset == "AVE":
        return ave_data.load_categories(f"{meta_root}/AVE/categories.txt")
    if dataset == "LLP":
        return list(avvp_data.CATEGORIES)
    raise ValueError(dataset)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["eval", "smoke"], default="smoke")
    p.add_argument("--dataset", choices=["AVE", "LLP"], default="AVE")
    p.add_argument("--cls", action="store_true",
                   help="AVE classification mode instead of per-segment events")
    p.add_argument("--meta", default="/root/reference/data/AVE")
    p.add_argument("--label-test", default="/root/reference/data/AVVP/AVVP_test_pd.csv")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    return p.parse_args(argv)


def main(argv=None, cfg: PretrainModelConfig | None = None, classnames=None):
    args = parse_args(argv)
    enable_persistent_cache()
    if args.mode == "eval" and args.dataset == "AVE":
        ds = ave_data.AVEDataset(
            args.meta, "test", frame_dir=args.frames, audio_dir=args.audio,
            img_size=(cfg.clip.image_size if cfg else 224),
            num_frames=(cfg.num_frames if cfg else 10),
            segment_samples=(cfg.htsat.frontend.clip_samples if cfg else 32000))
        names = classnames or ds.categories
    elif args.mode == "eval":
        ds = avvp_data.LLPDataset(
            args.label_test, frame_dir=args.frames, audio_dir=args.audio,
            st_dir=None, img_size=(cfg.clip.image_size if cfg else 224),
            num_frames=(cfg.num_frames if cfg else 10),
            segment_samples=(cfg.htsat.frontend.clip_samples if cfg else 32000))
        names = classnames or classnames_for("LLP")
    else:
        ds = None
        names = classnames or classnames_for(args.dataset)

    cfg = cfg or PretrainModelConfig(num_classes=len(names))
    params, state, buffers = PT.init_pretrain_model(jax.random.PRNGKey(0), cfg,
                                                    names)
    if args.ckpt:
        lp, ls = ckpt_lib.load_params_and_state(args.ckpt)
        # partial restore: class-count-dependent entries (clap text features,
        # prompt-learner heads) are skipped when the eval class list differs
        # from the pretrain one (zero_shot.py:92-93 semantics)
        params, skipped = ckpt_lib.restore_matching(params, lp)
        if skipped:
            print(f"ckpt: skipped {len(skipped)} shape-mismatched entries")
        if ls is not None:
            state, _ = ckpt_lib.restore_matching(state, ls)

    if args.mode == "smoke":
        B, T = 1, 2
        rs = np.random.RandomState(0)
        wave = jnp.asarray(rs.randn(B, T, cfg.htsat.frontend.clip_samples).astype(np.float32))
        imgs = jnp.asarray(rs.rand(B, T, cfg.clip.image_size, cfg.clip.image_size, 3).astype(np.float32))
        scores = zero_shot_scores(params, state, buffers, wave, imgs, cfg)
        gt = np.zeros((B, T, len(names)), np.float32)
        gt[..., 0] = 1
        acc = zero_shot_accuracy(scores, jnp.asarray(gt))
        print(f"zero-shot smoke: scores {scores.shape}, acc={float(acc):.2f}")
        return

    # --- real eval loop (zero_shot.py:131-199) ---
    tr, fr = partition_pretrain_params(params)
    estep = make_pretrain_eval_step(cfg, buffers)
    # LLPDataset has no st features for zero-shot; drop missing keys
    total_acc, total_n = 0.0, 0
    for batch in ave_data.batched_iterator(ds, args.batch_size, shuffle=False,
                                           drop_last=False):
        scores = estep(tr, fr, state, {"wave": jnp.asarray(batch["wave"]),
                                       "image": jnp.asarray(batch["image"])})
        B = len(batch["wave"])
        if args.dataset == "AVE" and not args.cls:
            acc = segment_accuracy(scores, batch["gt"])
            n = B * cfg.num_frames
        elif args.dataset == "AVE":
            from ..data.vggsound import weak_labels
            acc = weak_accuracy(scores, weak_labels(batch["gt"]),
                                num_frames=cfg.num_frames)
            n = B
        else:  # LLP classification: weak multihot target argmax
            acc = weak_accuracy(scores, batch["target"],
                                num_frames=cfg.num_frames)
            n = B
        total_acc += acc * n
        total_n += n
    acc = total_acc / max(total_n, 1)
    mode = "events" if (args.dataset == "AVE" and not args.cls) else "cls"
    print(f"zero-shot {args.dataset} {mode} accuracy: {acc:.2f} %")
    return acc


if __name__ == "__main__":
    main()
