"""AVS (S4 / MS3) dataset pipeline.

Rebuild of `avs_scripts/avs_s4/dataloader.py:60-219`: 5 frames png at 224^2,
binary masks (S4 train: only frame 1; MS3: all 5), wave `[5, 32000]` from a
per-video dict npy. The log-mel pkl / Kaldi-fbank paths exist in the reference
loader but the live model consumes raw wave (SURVEY.md §2.4).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .ave import IMAGENET_MEAN, IMAGENET_STD, resize_bicubic

NUM_FRAMES = 5
SR = 32000


def load_image(path: str, size: int = 224, normalize: bool = True) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"))
    img = resize_bicubic(img, size).astype(np.float32) / 255.0
    if normalize:
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img


def load_mask(path: str, size: int = 224) -> np.ndarray:
    from PIL import Image
    m = Image.open(path).convert("1").resize((size, size))
    return (np.asarray(m) > 0).astype(np.float32)[..., None]


def load_audio_log_mel(path: str) -> np.ndarray:
    """The reference loaders' precomputed VGGish log-mel pkl field
    (`avs_s4/dataloader.py:53-57`): a pickled torch tensor [5, 1, 96, 64].
    Dead on the reference's live path (the model consumes raw wave) —
    interface completeness only. Returns float32 numpy."""
    import pickle
    with open(path, "rb") as f:
        t = pickle.load(f)
    if hasattr(t, "detach"):  # torch tensor pickle
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


class S4Dataset:
    """Expects the AVSBench directory layout:
    `<root>/visual_frames/<split>/<category>/<video>/*.png` (or .jpg),
    `<root>/gt_masks/<split>/<category>/<video>/*.png`,
    `<root>/audio_wav/<video>.npy` (dict or array of waveforms).

    `with_log_mel=True` additionally loads the reference's
    `<root>/audio_log_mel/<split>/<category>/<video>.pkl` field (and computes
    the Kaldi-fbank `total_audio` stack via `data.fbank.wav2fbank` —
    dataloader.py:176-182) for pipelines that consume them."""

    def __init__(self, root: str, split: str = "train", mask_num: int = 1,
                 img_size: int = 224, num_frames: int = NUM_FRAMES,
                 segment_samples: int = SR, with_log_mel: bool = False):
        self.with_log_mel = with_log_mel
        self.root = root
        self.split = split
        self.mask_num = mask_num  # S4 train: 1; val/test + MS3: 5
        self.img_size = img_size
        self.num_frames = num_frames
        self.segment_samples = segment_samples
        self.videos = []
        vdir = os.path.join(root, "visual_frames", split)
        if os.path.isdir(vdir):
            for cat in sorted(os.listdir(vdir)):
                for vid in sorted(os.listdir(os.path.join(vdir, cat))):
                    self.videos.append((cat, vid))

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, i):
        cat, vid = self.videos[i]
        fdir = os.path.join(self.root, "visual_frames", self.split, cat, vid)
        mdir = os.path.join(self.root, "gt_masks", self.split, cat, vid)
        frames = sorted(f for f in os.listdir(fdir) if f.endswith((".png", ".jpg")))[:self.num_frames]
        imgs = np.stack([load_image(os.path.join(fdir, f), self.img_size) for f in frames])
        masks = []
        mfiles = sorted(f for f in os.listdir(mdir) if f.endswith(".png"))[:self.mask_num]
        for f in mfiles:
            masks.append(load_mask(os.path.join(mdir, f), self.img_size))
        wave = np.load(os.path.join(self.root, "audio_wav", f"{vid}.npy"),
                       allow_pickle=True)
        if isinstance(wave, np.ndarray) and wave.dtype == object:
            wave = wave.item()[vid]
        wave = np.asarray(wave, np.float32).reshape(-1)
        need = self.num_frames * self.segment_samples
        if len(wave) < need:
            wave = np.tile(wave, need // max(len(wave), 1) + 1)
        wave = wave[:need].reshape(self.num_frames, self.segment_samples)
        out = {"image": imgs, "mask": np.stack(masks), "wave": wave,
               "category": cat, "video": vid}
        if self.with_log_mel:
            from .fbank import wav2fbank
            lm_path = os.path.join(self.root, "audio_log_mel", self.split,
                                   cat, f"{vid}.pkl")
            if os.path.exists(lm_path):
                out["audio_log_mel"] = load_audio_log_mel(lm_path)
            flat = wave.reshape(-1)
            out["total_audio"] = np.stack(
                [wav2fbank(flat, idx=s, sample_rate=self.segment_samples)
                 for s in range(self.num_frames)])
        return out


def synthetic_batch(batch_size: int, *, img_size=224, seed=0, mask_frames=1):
    rs = np.random.RandomState(seed)
    return {
        "image": rs.rand(batch_size, NUM_FRAMES, img_size, img_size, 3).astype(np.float32),
        "wave": rs.randn(batch_size, NUM_FRAMES, SR).astype(np.float32) * 0.1,
        "mask": (rs.rand(batch_size * mask_frames if mask_frames > 1 else batch_size,
                         img_size, img_size, 1) > 0.5).astype(np.float32),
    }
