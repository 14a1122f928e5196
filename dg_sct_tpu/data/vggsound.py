"""VGGSound-AVEL-40K dataset — the pretrain suite's training corpus.

Rebuild of `pretrain/dataloader.py:88-111,296-343` (vggsound branch):
labels csv with `video_id,split,category,label` columns where `label` is a
10-long per-second event-flag list; GT is a (10, n_cls+1) one-hot grid with
the background class last (dataloader.py:305-315); 10 frames sampled from the
decoded jpg dir; wave `[10, 32000]` tiled/cropped.

K-shot subsampling (`shot > 0`) keeps the FIRST `shot` rows per category in
csv order (dataloader.py:99-110 uses `lst[:shot]`, not a random sample).
"""
from __future__ import annotations

import ast
import os
from typing import List, Optional

import numpy as np


def load_categories(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def weak_labels(gt: np.ndarray) -> np.ndarray:
    """Clip-level weak labels from (B, T, n_cls+1) segment grids
    (`pretrain/main_trans.py:96-108`): drop the bg column, take the FIRST
    frame with any event; all-background clips get a zero vector."""
    gt = np.asarray(gt)[:, :, :-1]
    out = np.zeros(gt.shape[::2], dtype=gt.dtype)   # (B, n_cls)
    for b in range(gt.shape[0]):
        nz = np.nonzero(gt[b].max(axis=-1))[0]
        if len(nz):
            out[b] = gt[b, nz[0]]
    return out


class VGGSoundAVELDataset:
    def __init__(self, root: str, split: str = "train",
                 frame_dir: Optional[str] = None,
                 audio_dir: Optional[str] = None, img_size: int = 224,
                 num_frames: int = 10, segment_samples: int = 32000,
                 shot: int = 0):
        import pandas as pd
        self.categories = load_categories(
            os.path.join(root, "VggsoundAVEL40kCategories.txt"))
        self.cat_idx = {c: i for i, c in enumerate(self.categories)}
        df = pd.read_csv(os.path.join(root, "vggsound-avel40k_labels.csv"))
        df = df[df["split"] == split].reset_index(drop=True)
        if split == "train" and shot > 0:
            by_cat: dict = {}
            for i in range(len(df)):
                by_cat.setdefault(df.iloc[i]["category"], []).append(i)
            keep = [i for lst in by_cat.values() for i in lst[:shot]]
            df = df.iloc[sorted(keep)].reset_index(drop=True)
        self.df = df
        self.frame_dir = frame_dir
        self.audio_dir = audio_dir
        self.img_size = img_size
        self.num_frames = num_frames
        self.segment_samples = segment_samples

    @property
    def num_classes(self):
        return len(self.categories)

    def __len__(self):
        return len(self.df)

    def _video_name(self, row) -> str:
        v = str(row["video_id"])
        return v.zfill(6) if v.isdigit() else v   # dataloader.py:303

    def __getitem__(self, i):
        from .ave import load_frames, load_wave
        row = self.df.iloc[i]
        name = self._video_name(row)
        flags = np.asarray(ast.literal_eval(str(row["label"])))  # (10,) 0/1
        n = len(self.categories)
        gt = np.zeros((self.num_frames, n + 1), np.float32)
        cat = self.cat_idx[row["category"]]
        t_idx = np.linspace(0, len(flags) - 1, self.num_frames).astype(int)
        for t, src in enumerate(t_idx):
            if flags[src] == 1:
                gt[t, cat] = 1.0
            else:
                gt[t, n] = 1.0
        return {
            "image": load_frames(self.frame_dir, name, self.num_frames,
                                 img_size=self.img_size),
            "wave": load_wave(self.audio_dir, name, self.num_frames,
                              self.segment_samples),
            "GT": gt,
        }
