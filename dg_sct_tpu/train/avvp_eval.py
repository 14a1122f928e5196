"""AVVP segment/event-level F1 evaluation.

Faithful rebuild of `DG-SCT/AVE/utils/eval_metrics.py:3-295` (`segment_level`,
`event_level`) and the eval loop of `DG-SCT/AVVP/main.py:88-200`.

All scores operate on (25, 10) binary class-x-segment grids per video.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _per_class_f1(TP, FP, FN):
    F = []
    for i in range(len(TP)):
        if (TP + FP)[i] != 0 or (TP + FN)[i] != 0:
            F.append(2 * TP[i] / (2 * TP[i] + (FN + FP)[i]))
    return sum(F) / len(F) if F else 1.0  # all true negatives


def segment_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av):
    """Per-video segment-level F1 for audio / visual / combined / AV."""
    def counts(SO, GT):
        TP = np.sum(SO * GT, axis=1)
        FN = np.sum((1 - SO) * GT, axis=1)
        FP = np.sum(SO * (1 - GT), axis=1)
        return TP, FP, FN

    TP_a, FP_a, FN_a = counts(SO_a, GT_a)
    TP_v, FP_v, FN_v = counts(SO_v, GT_v)
    TP_av, FP_av, FN_av = counts(SO_av, GT_av)
    f_a = _per_class_f1(TP_a, FP_a, FN_a)
    f_v = _per_class_f1(TP_v, FP_v, FN_v)
    f = _per_class_f1(TP_a + TP_v, FP_a + FP_v, FN_a + FN_v)
    f_av = _per_class_f1(TP_av, FP_av, FN_av)
    return f_a, f_v, f, f_av


def extract_events(seq):
    """Contiguous positive runs of a (10,) binary sequence as 10-d indicator
    vectors (eval_metrics.py:229-254)."""
    runs = []
    start = None
    for t in range(len(seq)):
        if seq[t] == 1 and start is None:
            start = t
        if (seq[t] != 1 or t == len(seq) - 1) and start is not None:
            end = t + 1 if seq[t] == 1 else t
            vec = np.zeros(len(seq))
            vec[start:end] = 1
            runs.append(vec)
            start = None
    return runs if runs else None


def _event_counts(SO, GT):
    TP = np.zeros(SO.shape[0])
    FP = np.zeros(SO.shape[0])
    FN = np.zeros(SO.shape[0])
    for n in range(SO.shape[0]):
        ep = extract_events(SO[n]) if SO[n].sum() != 0 else None
        eg = extract_events(GT[n]) if GT[n].sum() != 0 else None
        # event_wise_metric (eval_metrics.py:257-296): IoU >= 0.5 matching
        if ep is not None:
            for x1 in ep:
                hit = False
                if eg is not None:
                    for x2 in eg:
                        if np.sum(x1 * x2) >= 0.5 * np.sum(np.maximum(x1, x2)):
                            hit = True
                            break
                if hit:
                    TP[n] += 1
                else:
                    FP[n] += 1
        if eg is not None:
            for x1 in eg:
                hit = False
                if ep is not None:
                    for x2 in ep:
                        if np.sum(x1 * x2) >= 0.5 * np.sum(np.maximum(x1, x2)):
                            hit = True
                            break
                if not hit:
                    FN[n] += 1
    return TP, FP, FN


def event_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av):
    TP_a, FP_a, FN_a = _event_counts(SO_a, GT_a)
    TP_v, FP_v, FN_v = _event_counts(SO_v, GT_v)
    TP_av, FP_av, FN_av = _event_counts(SO_av, GT_av)
    f_a = _per_class_f1(TP_a, FP_a, FN_a)
    f_v = _per_class_f1(TP_v, FP_v, FN_v)
    f = _per_class_f1(TP_a + TP_v, FP_a + FP_v, FN_a + FN_v)
    f_av = _per_class_f1(TP_av, FP_av, FN_av)
    return f_a, f_v, f, f_av


def evaluate_video(out, GT_a, GT_v):
    """One video's predictions -> dict of 10 F1 scores (main.py:112-178).

    out: model output dict with global_prob (1,25), a_frame_prob/v_frame_prob
    (1,10,25); GT_a/GT_v: (25, 10) binary temporal annotations.
    """
    o = (np.asarray(out["global_prob"])[0] >= 0.5).astype(np.int64)   # (25,)
    Pa = (np.asarray(out["a_frame_prob"])[0] >= 0.5).astype(np.int64) * o[None, :]
    Pv = (np.asarray(out["v_frame_prob"])[0] >= 0.5).astype(np.int64) * o[None, :]
    SO_a, SO_v = Pa.T, Pv.T                                           # (25, 10)
    SO_av = SO_a * SO_v
    GT_av = GT_a * GT_v
    seg = segment_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av)
    evt = event_level(SO_a, SO_v, SO_av, GT_a, GT_v, GT_av)
    return {"seg_a": seg[0], "seg_v": seg[1], "seg": seg[2], "seg_av": seg[3],
            "evt_a": evt[0], "evt_v": evt[1], "evt": evt[2], "evt_av": evt[3]}


def summarize(per_video):
    """Aggregate per-video dicts into the reference's report (main.py:180-200)."""
    m = {k: 100.0 * float(np.mean([v[k] for v in per_video])) for k in per_video[0]}
    return {
        "segment_a": m["seg_a"], "segment_v": m["seg_v"], "segment_av": m["seg_av"],
        "segment_type_avg": (m["seg_a"] + m["seg_v"] + m["seg_av"]) / 3.0,
        "segment_event_avg": m["seg"],
        "event_a": m["evt_a"], "event_v": m["evt_v"], "event_av": m["evt_av"],
        "event_type_avg": (m["evt_a"] + m["evt_v"] + m["evt_av"]) / 3.0,
        "event_event_avg": m["evt"],
    }
