"""AVE dataset pipeline.

Rebuild of `DG-SCT/AVE/dataloader.py:33-186`: 10 frames per clip sampled with
np.linspace over the decoded jpgs, resized to 192 bicubic + ImageNet
normalization; waveform `.npy` tiled/cropped to `[10, 32000]`; one-hot labels
`(T=10, 29)` with background class 28.

Host-side (numpy/PIL) with a prefetching iterator that overlaps decode with
device compute. Labels can be rebuilt straight from `Annotations.txt` (the
reference ships prebuilt `*_order.h5` index files; both paths supported).
"""
from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Iterator, List, Optional, Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

NUM_CLASSES = 28  # foreground; bg = 28
NUM_SEGMENTS = 10
SAMPLE_RATE = 32000


def load_categories(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def parse_annotations(ann_path: str, categories: Sequence[str]):
    """Annotations.txt rows `Category&VideoID&Quality&Start&End` ->
    list of (video_id, onehot (10, 29))."""
    cat_idx = {c: i for i, c in enumerate(categories)}
    n_cls = len(categories)  # 28 for AVE; background = last column
    out = []
    with open(ann_path) as f:
        next(f)  # header
        for ln in f:
            parts = ln.strip().split("&")
            if len(parts) < 5:
                continue
            cat, vid, _, start, end = parts[:5]
            onehot = np.zeros((NUM_SEGMENTS, n_cls + 1), np.float32)
            onehot[:, n_cls] = 1.0
            s, e = int(float(start)), int(float(end))
            c = cat_idx[cat]
            for t in range(max(s, 0), min(e, NUM_SEGMENTS)):
                onehot[t, n_cls] = 0.0
                onehot[t, c] = 1.0
            out.append((vid, onehot))
    return out


def load_split_ids(path: str) -> List[str]:
    """trainSet/testSet/valSet.txt rows share the annotation format."""
    ids = []
    with open(path) as f:
        for ln in f:
            parts = ln.strip().split("&")
            if len(parts) >= 2 and parts[1] != "VideoID":
                ids.append(parts[1])
    return ids


def resize_bicubic(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize((size, size), Image.BICUBIC))


def load_frames(frame_dir: str, video_id: str, num_frames=NUM_SEGMENTS,
                img_size=192, raw_u8=False, yuv420=False):
    """Sample `num_frames` jpgs with np.linspace (dataloader.py:162-171).

    Default: (T, H, W, 3) float32 ImageNet-normalized (bit-parity with the
    reference's PIL+Normalize pipeline), via the native C++ decode+resize core
    when available. With `raw_u8=True`, the fast serving path: DCT-scaled
    decode to (T, H, W, 3) uint8 — normalization happens on-device
    (`ops.basic.normalize_frames_u8`), minimizing single-core host cost and
    host->device bytes. With `yuv420=True`, the half-payload path: returns
    (y (T, H, W) u8, uv (T, H/2, W/2, 2) u8) planes; chroma upsample +
    YCbCr->RGB + normalize run on-device
    (`ops.basic.normalize_frames_yuv420`)."""
    vdir = os.path.join(frame_dir, video_id)
    files = sorted(f for f in os.listdir(vdir) if f.endswith((".jpg", ".png")))
    idxs = np.linspace(0, len(files) - 1, num_frames).astype(int)
    paths = [os.path.join(vdir, files[i]) for i in idxs]

    from .. import native
    if native.available() and all(p.endswith(".jpg") for p in paths):
        if yuv420:
            return native.load_jpeg_batch_yuv420(paths, img_size)
        if raw_u8:
            return native.load_jpeg_batch_u8(paths, img_size)
        return native.load_jpeg_batch(paths, img_size, IMAGENET_MEAN, IMAGENET_STD)

    from PIL import Image
    if yuv420:
        ys, uvs = [], []
        for p in paths:
            ycc = np.asarray(Image.open(p).convert("YCbCr"))
            ycc = resize_bicubic(ycc, img_size)  # per-channel, mode-agnostic
            ys.append(ycc[..., 0].astype(np.uint8))
            uv = ycc[..., 1:].astype(np.float32)
            uv = uv.reshape(img_size // 2, 2, img_size // 2, 2, 2).mean((1, 3))
            uvs.append(np.round(uv).astype(np.uint8))
        return np.stack(ys), np.stack(uvs)
    frames = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        img = resize_bicubic(img, img_size)
        if raw_u8:
            frames.append(img.astype(np.uint8))
        else:
            img = img.astype(np.float32) / 255.0
            frames.append((img - IMAGENET_MEAN) / IMAGENET_STD)
    return np.stack(frames)


def load_wave(audio_dir: str, video_id: str, num_segments=NUM_SEGMENTS,
              sr=SAMPLE_RATE) -> np.ndarray:
    """`.npy` waveform tiled/cropped to (T, sr) (dataloader.py:174-179)."""
    wave = np.load(os.path.join(audio_dir, f"{video_id}.npy")).reshape(-1)
    need = num_segments * sr
    if len(wave) < need:
        wave = np.tile(wave, need // max(len(wave), 1) + 1)
    wave = wave[:need].reshape(num_segments, sr)
    # int16 PCM sources pass through untouched — the serving ingest path ships
    # i16 over the wire and dequantizes on-device (ops/basic.py); float sources
    # keep the float32 training contract.
    return wave if wave.dtype == np.int16 else wave.astype(np.float32)


class AVEDataset:
    """Map-style dataset over an AVE split."""

    def __init__(self, root: str, split: str = "train", img_size: int = 192,
                 frame_dir: Optional[str] = None, audio_dir: Optional[str] = None,
                 num_frames: int = NUM_SEGMENTS, segment_samples: int = SAMPLE_RATE,
                 raw_u8: bool = False, yuv420: bool = False,
                 wave_mulaw: bool = False):
        meta = os.path.join(root, "data", "AVE") if os.path.isdir(
            os.path.join(root, "data", "AVE")) else root
        self.categories = load_categories(os.path.join(meta, "categories.txt"))
        ann = dict(parse_annotations(os.path.join(meta, "Annotations.txt"),
                                     self.categories))
        split_file = {"train": "trainSet.txt", "test": "testSet.txt", "val": "valSet.txt"}[split]
        self.ids = [v for v in load_split_ids(os.path.join(meta, split_file)) if v in ann]
        self.labels = ann
        self.frame_dir = frame_dir
        self.audio_dir = audio_dir
        self.img_size = img_size
        self.num_frames = num_frames
        self.segment_samples = segment_samples
        self.raw_u8 = raw_u8
        self.yuv420 = yuv420
        self.wave_mulaw = wave_mulaw

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i):
        vid = self.ids[i]
        gt = self.labels[vid]
        if gt.shape[0] != self.num_frames:
            gt = gt[np.linspace(0, gt.shape[0] - 1, self.num_frames).astype(int)]
        wave = load_wave(self.audio_dir, vid, self.num_frames,
                         self.segment_samples)
        if self.wave_mulaw:
            # half-payload audio wire format; device inverse fuses into the
            # STFT prologue (ops.basic.dequantize_mulaw_u8)
            from ..ops.basic import encode_mulaw_u8
            wave = encode_mulaw_u8(wave)
        out = {"wave": wave, "GT": gt}
        if self.yuv420:
            y, uv = load_frames(self.frame_dir, vid, self.num_frames,
                                img_size=self.img_size, yuv420=True)
            out["image_y"], out["image_uv"] = y, uv
        else:
            out["image"] = load_frames(self.frame_dir, vid, self.num_frames,
                                       img_size=self.img_size,
                                       raw_u8=self.raw_u8)
        return out


def synthetic_batch(batch_size: int, *, img_size=192, num_segments=NUM_SEGMENTS,
                    sr=SAMPLE_RATE, seed=0):
    """Deterministic synthetic AVE batch (benchmarks / smoke tests)."""
    rs = np.random.RandomState(seed)
    gt = np.zeros((batch_size, num_segments, NUM_CLASSES + 1), np.float32)
    cls = rs.randint(0, NUM_CLASSES, size=batch_size)
    for b in range(batch_size):
        gt[b, :, cls[b]] = 1.0
    return {
        "wave": rs.randn(batch_size, num_segments, sr).astype(np.float32) * 0.1,
        "image": rs.rand(batch_size, num_segments, img_size, img_size, 3).astype(np.float32),
        "gt": gt,
    }


def default_collate(samples: Sequence[dict]) -> dict:
    """Stack numeric per-sample values into batch arrays; keep non-numeric
    values (strings, e.g. video ids / question types) as Python lists.
    `GT` is renamed to `gt` (the train-step batch key)."""
    batch = {}
    for key in samples[0]:
        out_key = "gt" if key == "GT" else key
        vals = [s[key] for s in samples]
        if isinstance(vals[0], (np.ndarray, np.number, int, float)):
            batch[out_key] = np.stack([np.asarray(v) for v in vals])
        else:
            batch[out_key] = list(vals)
    return batch


def batched_iterator(dataset, batch_size: int, *, shuffle=True, seed=0,
                     drop_last=True, num_workers=4, prefetch=2,
                     collate=default_collate) -> Iterator[dict]:
    """Threaded prefetching loader: worker threads decode samples, a collator
    stacks them, `prefetch` ready batches buffer ahead of the device step."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    batches = [order[i:i + batch_size] for i in range(0, len(order), batch_size)]
    if drop_last:
        batches = [b for b in batches if len(b) == batch_size]

    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    stop = threading.Event()

    def produce():
        try:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as ex:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(ex.map(lambda i: dataset[int(i)], idxs))
                    q.put(collate(samples))
        except Exception as e:  # surface loader errors to the consumer
            q.put(e)
            return
        q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, Exception):
                raise batch
            yield batch
    finally:
        stop.set()


def device_prefetch(it, *, size: int = 2, keys=("wave", "image")) -> Iterator[dict]:
    """Double-buffered host->device staging: a daemon thread device_puts (and
    fences) up to `size` batches AHEAD of the consumer, so the transfer of
    batch k+1 overlaps the device forward of batch k. Through the axon tunnel
    ingest runs at single-digit..tens of MB/s (bench_e2e measures it), which
    otherwise serializes with compute; on attached hardware (PCIe) the same
    overlap hides the copy entirely. Non-`keys` entries pass through on host
    (labels stay host-side for metrics)."""
    import jax

    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    stop = threading.Event()

    def produce():
        try:
            for b in it:
                if stop.is_set():
                    return
                staged = {k: (jax.device_put(v) if k in keys else v)
                          for k, v in b.items()}
                jax.block_until_ready([staged[k] for k in keys if k in staged])
                q.put(staged)
        except Exception as e:
            q.put(e)
            return
        q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            if isinstance(batch, Exception):
                raise batch
            yield batch
    finally:
        stop.set()
