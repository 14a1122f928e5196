"""AVVP F1 harness vs an independent torch-free reimplementation of the
reference formulas."""
import numpy as np

from dg_sct_tpu.train import avvp_eval as E


def test_segment_level_perfect_and_empty():
    GT = np.zeros((25, 10))
    GT[3, 2:7] = 1
    f_a, f_v, f, f_av = E.segment_level(GT, GT, GT, GT, GT, GT)
    assert f_a == f_v == f == f_av == 1.0
    # all-negative: reference returns 1.0 (all true negatives)
    Z = np.zeros((25, 10))
    assert E.segment_level(Z, Z, Z, Z, Z, Z) == (1.0, 1.0, 1.0, 1.0)


def test_segment_level_partial():
    GT = np.zeros((25, 10))
    GT[0, :4] = 1
    SO = np.zeros((25, 10))
    SO[0, :2] = 1  # precision 1, recall 0.5 -> F1 = 2/3
    f_a, _, _, _ = E.segment_level(SO, np.zeros_like(SO), np.zeros_like(SO),
                                   GT, np.zeros_like(GT), np.zeros_like(GT))
    assert abs(f_a - 2 / 3) < 1e-9


def test_extract_events():
    seq = np.array([0, 1, 1, 0, 1, 0, 0, 1, 1, 1])
    runs = E.extract_events(seq)
    assert len(runs) == 3
    np.testing.assert_array_equal(runs[0], [0, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(runs[2], [0, 0, 0, 0, 0, 0, 0, 1, 1, 1])
    assert E.extract_events(np.zeros(10)) is None
    np.testing.assert_array_equal(E.extract_events(np.ones(10))[0], np.ones(10))


def test_event_level_iou_matching():
    GT = np.zeros((25, 10))
    GT[0, 0:4] = 1
    SO = np.zeros((25, 10))
    SO[0, 0:3] = 1      # IoU 3/4 >= 0.5 -> TP
    f_a, _, _, _ = E.event_level(SO, np.zeros_like(SO), np.zeros_like(SO),
                                 GT, np.zeros_like(GT), np.zeros_like(GT))
    assert f_a == 1.0
    SO2 = np.zeros((25, 10))
    SO2[0, 6:8] = 1     # no overlap -> FP + FN
    f_a2, _, _, _ = E.event_level(SO2, np.zeros_like(SO), np.zeros_like(SO),
                                  GT, np.zeros_like(GT), np.zeros_like(GT))
    assert f_a2 == 0.0


def test_evaluate_video_and_summary():
    rs = np.random.RandomState(0)
    out = {"global_prob": rs.rand(1, 25),
           "a_frame_prob": rs.rand(1, 10, 25),
           "v_frame_prob": rs.rand(1, 10, 25)}
    GT_a = (rs.rand(25, 10) > 0.8).astype(np.int64)
    GT_v = (rs.rand(25, 10) > 0.8).astype(np.int64)
    scores = E.evaluate_video(out, GT_a, GT_v)
    assert set(scores) == {"seg_a", "seg_v", "seg", "seg_av",
                           "evt_a", "evt_v", "evt", "evt_av"}
    summary = E.summarize([scores, scores])
    assert 0.0 <= summary["segment_type_avg"] <= 100.0
