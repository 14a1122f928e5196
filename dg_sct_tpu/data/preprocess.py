"""Raw-media preprocessing — the `pretrain/scripts/extract_{frames,audio}.py`
and `AVS/preprocess_scripts/` equivalents.

The datasets consume decoded trees (`frames/<vid>/%08d.jpg`, `audio/<vid>.npy`
waveforms at 32 kHz); these utilities produce them from source videos/wavs.
Frame extraction shells out to ffmpeg (same as the reference scripts) and is
gated on its availability; the audio path (wav -> mono 32 kHz float -> .npy)
is pure scipy/numpy and runs anywhere.
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np

TARGET_SR = 32000


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def extract_frames(video_path: str, out_dir: str, fps: int = 8,
                   quality: int = 2) -> int:
    """Decode a video into `<out_dir>/%08d.jpg` at `fps` (1-indexed, the
    naming every loader's linspace sampler expects —
    pretrain/dataloader.py:325-330). Returns the frame count."""
    if not have_ffmpeg():
        raise RuntimeError("extract_frames requires ffmpeg on PATH")
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
         "-vf", f"fps={fps}", "-q:v", str(quality),
         os.path.join(out_dir, "%08d.jpg")],
        check=True)
    return len([f for f in os.listdir(out_dir) if f.endswith(".jpg")])


def extract_audio_wav(video_path: str, wav_path: str, sr: int = TARGET_SR) -> None:
    """Demux + resample a video's audio track to mono `sr` wav via ffmpeg."""
    if not have_ffmpeg():
        raise RuntimeError("extract_audio_wav requires ffmpeg on PATH")
    os.makedirs(os.path.dirname(os.path.abspath(wav_path)), exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
         "-ac", "1", "-ar", str(sr), "-vn", wav_path],
        check=True)


def wav_to_wave_npy(wav_path: str, npy_path: Optional[str] = None,
                    sr: int = TARGET_SR, clip_seconds: int = 10) -> np.ndarray:
    """wav file -> the `.npy` float waveform the loaders consume
    (`data/ave.py:load_wave`): mono, resampled to `sr`, tiled/cropped to
    `clip_seconds * sr` samples, float32 in [-1, 1]."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    in_sr, data = wavfile.read(wav_path)
    data = np.asarray(data)
    if np.issubdtype(data.dtype, np.integer):  # scale BEFORE any float promote
        data = data.astype(np.float32) / float(np.iinfo(data.dtype).max)
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:                         # downmix
        data = data.mean(axis=1).astype(np.float32)
    if in_sr != sr:
        g = np.gcd(int(in_sr), int(sr))
        data = resample_poly(data, sr // g, in_sr // g).astype(np.float32)
    need = clip_seconds * sr
    if len(data) == 0:
        data = np.zeros(need, np.float32)
    if len(data) < need:
        data = np.tile(data, need // len(data) + 1)
    data = data[:need]
    if npy_path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(npy_path)), exist_ok=True)
        np.save(npy_path, data)
    return data


def preprocess_video_tree(video_dir: str, out_root: str, *, fps: int = 8,
                          clip_seconds: int = 10,
                          extensions=(".mp4", ".mkv", ".webm", ".avi")) -> int:
    """Videos in `video_dir` -> `<out_root>/frames/<vid>/%08d.jpg` +
    `<out_root>/audio/<vid>.npy` — the layout every task dataset reads.
    Returns the number of processed videos. Requires ffmpeg."""
    n = 0
    for name in sorted(os.listdir(video_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in extensions:
            continue
        src = os.path.join(video_dir, name)
        extract_frames(src, os.path.join(out_root, "frames", stem), fps=fps)
        wav_tmp = os.path.join(out_root, "audio", stem + ".wav")
        extract_audio_wav(src, wav_tmp)
        wav_to_wave_npy(wav_tmp, os.path.join(out_root, "audio", stem + ".npy"),
                        clip_seconds=clip_seconds)
        os.remove(wav_tmp)
        n += 1
    return n
