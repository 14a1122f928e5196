"""Precomputed-feature extraction — `pretrain/scripts/extract_rgb_feat.py` /
`extract_3D_feat.py` equivalents, TPU-native.

The reference runs one-off CUDA scripts (torchvision resnet152 -> res152.npy
per-frame 2048-d; r2plus1d_18 -> r2plus1d_18.npy per-8-frame-clip 512-d) whose
outputs the LLP/pretrain dataloaders consume. Here the same pipelines run
through the jitted JAX backbones in `models/video_feats.py`; released
torchvision weights load via the `*_from_torch` converters when a state dict
is supplied (this environment ships no pretrained blobs — same situation as
the reference checkout, `.MISSING_LARGE_BLOBS`).

CLI:
    python -m dg_sct_tpu.data.feature_extract rgb  --video-path F --output-dir O
    python -m dg_sct_tpu.data.feature_extract clip --video-path F --output-dir O
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .ave import IMAGENET_MEAN, IMAGENET_STD, resize_bicubic


def _load_frame(path, size):
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"))
    img = resize_bicubic(img, size).astype(np.float32) / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def _sample_frames(video_dir, n):
    files = sorted(f for f in os.listdir(video_dir)
                   if f.endswith((".jpg", ".png")))
    idx = np.round(np.linspace(0, len(files) - 1, n)).astype(int)
    return [os.path.join(video_dir, files[i]) for i in idx]


def extract_rgb_feats(video_path, output_dir, *, n_frame_steps=80,
                      img_size=224, params=None, batch=16):
    """Per-video (n_frame_steps, 2048) resnet152 features -> <video>.npy
    (extract_rgb_feat.py:20-58)."""
    import jax
    import jax.numpy as jnp
    from ..models import video_feats as VF

    if params is None:
        params = VF.init_resnet152(jax.random.PRNGKey(0))
    fn = jax.jit(VF.resnet152_features)
    os.makedirs(output_dir, exist_ok=True)
    for video in sorted(os.listdir(video_path)):
        vdir = os.path.join(video_path, video)
        if not os.path.isdir(vdir):
            continue
        paths = _sample_frames(vdir, n_frame_steps)
        frames = np.stack([_load_frame(p, img_size) for p in paths])
        feats = []
        for i in range(0, len(frames), batch):
            feats.append(np.asarray(fn(params, jnp.asarray(frames[i:i + batch]))))
        np.save(os.path.join(output_dir, f"{video}.npy"),
                np.concatenate(feats).astype(np.float32))


def extract_3d_feats(video_path, output_dir, *, n_frame_steps=80,
                     img_size=112, params=None):
    """Per-video (n_frame_steps//8, 512) r2plus1d_18 clip features ->
    <video>.npy (extract_3D_feat.py:21-58): frames grouped 8 per clip."""
    import jax
    import jax.numpy as jnp
    from ..models import video_feats as VF

    if params is None:
        params = VF.init_r2plus1d_18(jax.random.PRNGKey(0))
    fn = jax.jit(VF.r2plus1d_18_features)
    os.makedirs(output_dir, exist_ok=True)
    for video in sorted(os.listdir(video_path)):
        vdir = os.path.join(video_path, video)
        if not os.path.isdir(vdir):
            continue
        paths = _sample_frames(vdir, n_frame_steps)
        frames = np.stack([_load_frame(p, img_size) for p in paths])
        clips = frames[: (len(frames) // 8) * 8].reshape(
            -1, 8, img_size, img_size, 3)
        feats = np.asarray(fn(params, jnp.asarray(clips)))
        np.save(os.path.join(output_dir, f"{video}.npy"),
                feats.astype(np.float32))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["rgb", "clip"])
    p.add_argument("--video-path", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--n-frame-steps", type=int, default=80)
    p.add_argument("--torch-ckpt", default=None,
                   help="optional torchvision state dict (.pt/.npz) to load")
    args = p.parse_args(argv)
    params = None
    if args.torch_ckpt:
        import torch
        from ..models import video_feats as VF
        sd = torch.load(args.torch_ckpt, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        params = (VF.resnet152_from_torch(sd) if args.mode == "rgb"
                  else VF.r2plus1d_18_from_torch(sd))
    if args.mode == "rgb":
        extract_rgb_feats(args.video_path, args.output_dir,
                          n_frame_steps=args.n_frame_steps, params=params)
    else:
        extract_3d_feats(args.video_path, args.output_dir,
                         n_frame_steps=args.n_frame_steps, params=params)


if __name__ == "__main__":
    main()
