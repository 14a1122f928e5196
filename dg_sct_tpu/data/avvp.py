"""AVVP (LLP) dataset pipeline.

Rebuild of `DG-SCT/AVVP/dataloader.py:46-196`: 10 frames/clip, `[10,32000]`
wave, r2plus1d 512-d `video_st` features from npy, weak multi-label targets
parsed from the csv label column (`label1,label2` category names).

The csv metadata ships with the reference (`/root/reference/data/AVVP/*.csv`);
raw media dirs are configured by the caller.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

CATEGORIES = [
    "Speech", "Car", "Cheering", "Dog", "Cat", "Frying_(food)", "Basketball_bounce",
    "Fire_alarm", "Chainsaw", "Cello", "Banjo", "Singing", "Chicken_rooster",
    "Violin_fiddle", "Vacuum_cleaner", "Baby_laughter", "Accordion", "Lawn_mower",
    "Motorcycle", "Helicopter", "Acoustic_guitar", "Telephone_bell_ringing",
    "Baby_cry_infant_cry", "Blender", "Clapping"]

CAT_IDX = {c: i for i, c in enumerate(CATEGORIES)}


def parse_label_csv(path: str):
    """Rows `filename\tlabels` (tab csv) -> [(video_id, multihot (25,))]."""
    import pandas as pd
    df = pd.read_csv(path, header=0, sep="\t")
    out = []
    for _, row in df.iterrows():
        vid = row["filename"]
        target = np.zeros(len(CATEGORIES), np.float32)
        for lab in str(row["event_labels"]).split(","):
            if lab in CAT_IDX:
                target[CAT_IDX[lab]] = 1.0
        out.append((vid, target))
    return out


class LLPDataset:
    def __init__(self, label_csv: str, frame_dir: Optional[str] = None,
                 audio_dir: Optional[str] = None, st_dir: Optional[str] = None,
                 img_size: int = 192, num_frames: int = 10,
                 segment_samples: int = 32000):
        self.samples = parse_label_csv(label_csv)
        self.frame_dir = frame_dir
        self.audio_dir = audio_dir
        self.st_dir = st_dir
        self.img_size = img_size
        self.num_frames = num_frames
        self.segment_samples = segment_samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from .ave import load_frames, load_wave
        vid, target = self.samples[i]
        name = vid[:11]
        out = {
            "image": load_frames(self.frame_dir, name, self.num_frames,
                                 img_size=self.img_size),
            "wave": load_wave(self.audio_dir, name, self.num_frames,
                              self.segment_samples),
            "target": target,
            "video": name,
        }
        if self.st_dir is not None:  # zero-shot LLP runs without r2plus1d feats
            st = np.load(os.path.join(self.st_dir, f"{name}.npy")).astype(np.float32)
            if st.shape[0] != self.num_frames:  # (10, 512) in the reference
                st = st[np.linspace(0, st.shape[0] - 1, self.num_frames).astype(int)]
            out["video_st"] = st
        return out


def parse_eval_csv(path: str, num_segments: int = 10):
    """AVVP_eval_audio/visual.csv rows: filename, onset, offset, event_labels
    (second-level temporal annotations for segment/event F1)."""
    import pandas as pd
    df = pd.read_csv(path, header=0, sep="\t")
    ann = {}
    for _, row in df.iterrows():
        vid = row["filename"][:11]
        grid = ann.setdefault(vid, np.zeros((len(CATEGORIES), num_segments), np.int64))
        for lab in str(row["event_labels"]).split(","):
            if lab in CAT_IDX:
                onset, offset = int(row["onset"]), int(row["offset"])
                grid[CAT_IDX[lab], onset:min(offset, num_segments)] = 1
    return ann


def synthetic_batch(batch_size: int, *, img_size=192, seed=0):
    rs = np.random.RandomState(seed)
    target = (rs.rand(batch_size, len(CATEGORIES)) > 0.8).astype(np.float32)
    target[:, 0] = 1.0  # ensure nonempty
    return {
        "wave": rs.randn(batch_size, 10, 32000).astype(np.float32) * 0.1,
        "image": rs.rand(batch_size, 10, img_size, img_size, 3).astype(np.float32),
        "video_st": rs.randn(batch_size, 10, 512).astype(np.float32),
        "target": target,
    }
