"""MUSIC-AVQA dataset pipeline.

Rebuild of `net_grd_avst/dataloader_avst.py`: question tokenization against
the 93-word vocab (max_len 14, '<pad>'-padded), 42-answer vocab, 10 positive
frames, negatives sampled from other videos, wave `[10, 32000]`.

Vocab files ship with the reference (`data/AVQA/ques_vocab.txt` /
`ans_vocab.txt`); question jsons are the MUSIC-AVQA release.
"""
from __future__ import annotations

import ast
import json
import os
from typing import List, Optional

import numpy as np

MAX_QST_LEN = 14


def load_vocab(path: str) -> List[str]:
    with open(path) as f:
        return [ln.rstrip("\n") for ln in f if ln.rstrip("\n")]


def build_vocabs(train_json: str):
    """Live-build the question/answer vocabs from the train split exactly like
    the reference (`dataloader_avst.py:40-65`): '<pad>' first, then words in
    first-appearance order over template-substituted questions; answers in
    first-appearance order. MUSIC-AVQA yields 93 question words / 42 answers."""
    with open(train_json) as f:
        samples = json.load(f)
    ques_vocab, ans_vocab = ["<pad>"], []
    for s in samples:
        for wd in parse_question(s):
            if wd not in ques_vocab:
                ques_vocab.append(wd)
        if s["anser"] not in ans_vocab:
            ans_vocab.append(s["anser"])
    return ques_vocab, ans_vocab


def parse_question(sample: dict) -> List[str]:
    """Substitute template values into the question (dataloader_avst.py:49-56)."""
    words = sample["question_content"].rstrip().split(" ")
    words[-1] = words[-1][:-1]  # strip the trailing '?'
    p = 0
    templ = ast.literal_eval(sample["templ_values"])
    for i in range(len(words)):
        if "<" in words[i]:
            words[i] = templ[p]
            p += 1
    return words


def tokenize(words: List[str], word_to_ix: dict, max_len: int = MAX_QST_LEN) -> np.ndarray:
    idxs = [word_to_ix.get(w, 0) for w in words][:max_len]
    idxs += [word_to_ix["<pad>"]] * (max_len - len(idxs))
    return np.asarray(idxs, np.int64)


class AVQADataset:
    def __init__(self, meta_root: str, split_json: str, frame_dir: Optional[str] = None,
                 audio_dir: Optional[str] = None, img_size: int = 192,
                 num_frames: int = 10, segment_samples: int = 32000, seed: int = 0):
        ques_path = os.path.join(meta_root, "ques_vocab.txt")
        if os.path.exists(ques_path):
            self.ques_vocab = load_vocab(ques_path)
            self.ans_vocab = load_vocab(os.path.join(meta_root, "ans_vocab.txt"))
        else:
            # live-build from the train split (dataloader_avst.py:40-65); the
            # reference data dir ships jsons + ans_vocab.txt but no ques vocab
            train_json = next(p for p in (
                os.path.join(meta_root, "json", "avqa-train.json"),
                os.path.join(meta_root, "avqa-train.json"),
                os.path.join(os.path.dirname(split_json), "avqa-train.json"))
                if os.path.exists(p))
            self.ques_vocab, built_ans = build_vocabs(train_json)
            ans_path = os.path.join(meta_root, "ans_vocab.txt")
            self.ans_vocab = load_vocab(ans_path) if os.path.exists(ans_path) \
                else built_ans
        self.word_to_ix = {w: i for i, w in enumerate(self.ques_vocab)}
        self.ans_to_ix = {w: i for i, w in enumerate(self.ans_vocab)}
        with open(split_json) as f:
            self.samples = json.load(f)
        self.frame_dir = frame_dir
        self.audio_dir = audio_dir
        self.img_size = img_size
        self.num_frames = num_frames
        self.segment_samples = segment_samples
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from .ave import load_frames, load_wave
        s = self.samples[i]
        vid = s["video_id"]
        q = tokenize(parse_question(s), self.word_to_ix)
        # negative video: any other index (dataloader_avst.py:194-226)
        j = self.rng.randint(len(self.samples) - 1)
        if j >= i:
            j += 1
        nega_vid = self.samples[j]["video_id"]
        return {
            "visual_posi": load_frames(self.frame_dir, vid, self.num_frames, self.img_size),
            "visual_nega": load_frames(self.frame_dir, nega_vid, self.num_frames, self.img_size),
            "wave": load_wave(self.audio_dir, vid, self.num_frames, self.segment_samples),
            "question": q,
            "answer": np.int64(self.ans_to_ix[s["anser"]]),
            "type": s.get("type", ""),
        }


def question_type_accuracies(types, correct):
    """Per-question-type accuracy table (main_avst.py:141-222): 9 categories
    from the json `type` field ["Modality", "SubType"]."""
    buckets = {}
    for t, c in zip(types, correct):
        try:
            modality, sub = ast.literal_eval(t)
        except (ValueError, SyntaxError):
            modality, sub = "Unknown", "Unknown"
        key = f"{modality}/{sub}"
        buckets.setdefault(key, []).append(c)
        buckets.setdefault(modality, []).append(c)
    buckets["Avg"] = list(correct)
    return {k: 100.0 * float(np.mean(v)) for k, v in buckets.items()}


def synthetic_batch(batch_size: int, *, img_size=192, num_frames=10, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "wave": rs.randn(batch_size, num_frames, 32000).astype(np.float32) * 0.1,
        "visual_posi": rs.rand(batch_size, num_frames, img_size, img_size, 3).astype(np.float32),
        "visual_nega": rs.rand(batch_size, num_frames, img_size, img_size, 3).astype(np.float32),
        "question": rs.randint(0, 93, size=(batch_size, MAX_QST_LEN)),
        "answer": rs.randint(0, 42, size=(batch_size,)),
    }
