"""Synthetic on-disk media trees for driver integration tests.

Builds the directory layouts the real datasets expect (decoded jpg frames,
waveform .npy, r2plus1d .npy, csv/txt/json metadata) so the full real-data
epoch/eval loops run end-to-end on tiny configs without any reference media.
"""
from __future__ import annotations

import json
import os

import numpy as np


def save_jpegs(vdir: str, n_frames: int, size: int = 64, seed: int = 0):
    from PIL import Image
    os.makedirs(vdir, exist_ok=True)
    rs = np.random.RandomState(seed)
    for i in range(n_frames):
        arr = rs.randint(0, 255, size=(size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(vdir, f"{i:08d}.jpg"), quality=90)


def save_pngs(vdir: str, n_frames: int, size: int = 64, seed: int = 0,
              binary: bool = False):
    from PIL import Image
    os.makedirs(vdir, exist_ok=True)
    rs = np.random.RandomState(seed)
    for i in range(n_frames):
        if binary:
            arr = (rs.rand(size, size) > 0.5).astype(np.uint8) * 255
            Image.fromarray(arr, mode="L").save(os.path.join(vdir, f"{i}.png"))
        else:
            arr = rs.randint(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(vdir, f"{i}.png"))


def save_wave(audio_dir: str, vid: str, n_samples: int, seed: int = 0,
              dtype=np.float32):
    os.makedirs(audio_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    wave = rs.randn(n_samples) * 0.05
    if np.dtype(dtype) == np.int16:  # PCM container format (serving ingest)
        wave = np.clip(wave, -1.0, 1.0) * 32767.0
    np.save(os.path.join(audio_dir, f"{vid}.npy"), wave.astype(dtype))


def make_llp_tree(root, video_ids, *, n_frames=3, img_size=64, wave_samples=8000,
                  labels=("Speech", "Dog")):
    """LLP/AVVP layout: frames/<id>/*.jpg, audio/<id>.npy, st/<id>.npy + csvs."""
    frames, audio, st = (os.path.join(root, d) for d in ("frames", "audio", "st"))
    rows = ["filename\tevent_labels"]
    eval_rows_a = ["filename\tonset\toffset\tevent_labels"]
    eval_rows_v = ["filename\tonset\toffset\tevent_labels"]
    for i, vid in enumerate(video_ids):
        save_jpegs(os.path.join(frames, vid[:11]), n_frames, img_size, seed=i)
        save_wave(audio, vid[:11], wave_samples, seed=i)
        os.makedirs(st, exist_ok=True)
        np.save(os.path.join(st, f"{vid[:11]}.npy"),
                np.random.RandomState(i).randn(10, 512).astype(np.float32))
        lab = labels[i % len(labels)]
        rows.append(f"{vid}\t{lab}")
        eval_rows_a.append(f"{vid}\t0\t2\t{lab}")
        eval_rows_v.append(f"{vid}\t1\t2\t{lab}")
    for name, content in [("AVVP_train.csv", rows), ("AVVP_val_pd.csv", rows),
                          ("AVVP_test_pd.csv", rows),
                          ("AVVP_eval_audio.csv", eval_rows_a),
                          ("AVVP_eval_visual.csv", eval_rows_v)]:
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(content) + "\n")
    return {"frames": frames, "audio": audio, "st": st, "root": root}


def make_avs_tree(root, videos, *, split="train", n_frames=5, img_size=64,
                  wave_samples=8000, mask_frames=5):
    """AVSBench layout: visual_frames/<split>/<cat>/<vid>/*.png,
    gt_masks/<split>/<cat>/<vid>/*.png, audio_wav/<vid>.npy."""
    for i, (cat, vid) in enumerate(videos):
        save_pngs(os.path.join(root, "visual_frames", split, cat, vid),
                  n_frames, img_size, seed=i)
        save_pngs(os.path.join(root, "gt_masks", split, cat, vid),
                  mask_frames, img_size, seed=100 + i, binary=True)
        save_wave(os.path.join(root, "audio_wav"), vid, wave_samples, seed=i)
    return root


def make_ave_tree(root, video_ids, categories, *, n_frames=3, img_size=64,
                  wave_samples=8000, wave_dtype=np.float32):
    """AVE layout: frames/<id>/*.jpg, audio/<id>.npy + meta txts.

    `wave_dtype=np.int16` writes PCM containers (the serving ingest format —
    data/ave.load_wave passes int16 through untouched for on-device dequant).
    """
    frames, audio = os.path.join(root, "frames"), os.path.join(root, "audio")
    with open(os.path.join(root, "categories.txt"), "w") as f:
        f.write("\n".join(categories) + "\n")
    ann = ["Category&VideoID&Quality&StartTime&EndTime"]
    for i, vid in enumerate(video_ids):
        save_jpegs(os.path.join(frames, vid), n_frames, img_size, seed=i)
        save_wave(audio, vid, wave_samples, seed=i, dtype=wave_dtype)
        ann.append(f"{categories[i % len(categories)]}&{vid}&good&0&10")
    for name in ("Annotations.txt", "trainSet.txt", "testSet.txt", "valSet.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(ann) + "\n")
    return {"frames": frames, "audio": audio, "meta": root}


def make_avqa_tree(root, video_ids, *, n_frames=3, img_size=64,
                   wave_samples=8000, n_q=4):
    """MUSIC-AVQA layout: frames/<id>/*.jpg, audio/<id>.npy, vocab txts,
    split jsons with templated questions."""
    frames, audio = os.path.join(root, "frames"), os.path.join(root, "audio")
    for i, vid in enumerate(video_ids):
        save_jpegs(os.path.join(frames, vid), n_frames, img_size, seed=i)
        save_wave(audio, vid, wave_samples, seed=i)
    ques_vocab = ["<pad>", "how", "many", "instruments", "are", "in", "the",
                  "video", "is", "there", "a", "violin", "piano"]
    ans_vocab = ["one", "two", "yes", "no"]
    with open(os.path.join(root, "ques_vocab.txt"), "w") as f:
        f.write("\n".join(ques_vocab) + "\n")
    with open(os.path.join(root, "ans_vocab.txt"), "w") as f:
        f.write("\n".join(ans_vocab) + "\n")
    types = [["Audio", "Counting"], ["Visual", "Location"],
             ["Audio-Visual", "Existential"], ["Audio-Visual", "Temporal"]]
    samples = []
    for q in range(n_q):
        vid = video_ids[q % len(video_ids)]
        samples.append({
            "video_id": vid,
            "question_content": "is there a <Object> in the video?",
            "templ_values": "['violin']",
            "anser": ans_vocab[q % len(ans_vocab)],
            "type": str(types[q % len(types)]),
        })
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"avqa-{split}.json"), "w") as f:
            json.dump(samples, f)
    return {"frames": frames, "audio": audio, "meta": root}


def make_vggsound_tree(root, video_ids, categories, *, n_frames=3, img_size=64,
                       wave_samples=8000):
    """VGGSound-AVEL-40K layout (pretrain/dataloader.py:88-111): a labels csv
    with split/category columns + frames/audio dirs."""
    frames, audio = os.path.join(root, "frames"), os.path.join(root, "audio")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "VggsoundAVEL40kCategories.txt"), "w") as f:
        f.write("\n".join(categories) + "\n")
    rows = ["video_id,split,category,label"]
    for i, vid in enumerate(video_ids):
        save_jpegs(os.path.join(frames, vid), n_frames, img_size, seed=i)
        save_wave(audio, vid, wave_samples, seed=i)
        cat = categories[i % len(categories)]
        flags = [1] * 10 if i % 3 else [1] * 5 + [0] * 5
        split = "train" if i % 2 == 0 else "test"
        rows.append(f'{vid},{split},{cat},"{flags}"')
    with open(os.path.join(root, "vggsound-avel40k_labels.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    return {"frames": frames, "audio": audio, "meta": root}
