"""mAP matching-semantics tests (pycocotools parity).

Fixtures are hand-executed traces of pycocotools' COCOeval.evaluateImg greedy
matching (reference vendored it via torchmetrics-0.6 MeanAveragePrecision,
torchok/metrics/torchmetric_060/map.py:130). Each case is constructed to
discriminate the correct semantics from the round-1 argmax-only matcher.
"""
import numpy as np
import pytest

from torchok_tpu.constructor import METRICS
from torchok_tpu.metrics.detection import _match_image


def _run_metric(name, pred_boxes, pred_scores, pred_labels, gt_boxes,
                gt_labels, **kwargs):
    m = METRICS.get(name)(**kwargs, mapping={})
    state = m.empty_state()
    state = m.update(
        state,
        prediction_bboxes=np.asarray(pred_boxes, np.float32)[None],
        prediction_scores=np.asarray(pred_scores, np.float32)[None],
        prediction_labels=np.asarray(pred_labels)[None],
        gt_bboxes=np.asarray(gt_boxes, np.float32)[None],
        gt_labels=np.asarray(gt_labels)[None],
    )
    return m.compute(state)


def test_second_best_gt_is_matched():
    """d2's argmax-IoU GT is already taken by d1, but another unmatched GT
    overlaps above threshold — pycocotools (_match_image / CocoEvalMAP)
    matches it (TP); mmdet's tpfp_default (MMDetectionMAP) keeps it FP.
    Both semantics are pinned here."""
    gt_a = [0, 0, 10, 10]
    gt_b = [6, 0, 16, 10]  # overlaps gt_a
    d1 = [0, 0, 10, 10]    # IoU 1.0 with A
    d2 = [1, 0, 11, 10]    # IoU(A)=0.818 > IoU(B)=0.333... both above 0.3
    scores, tp = _match_image(
        np.array([d1, d2], np.float32), np.array([0.9, 0.8], np.float32),
        np.array([gt_a, gt_b], np.float32), iou_thr=0.3)
    assert tp.tolist() == [1.0, 1.0]

    # CocoEvalMAP at a fixed 0.5 threshold would need different fixtures;
    # assert the MM metric's argmax-only behavior directly instead: d2 is FP
    # even though gt_b is free, so AP < 1 (recall tops out at 0.5 before the
    # FP, then interpolation over the missed gt_b caps the area).
    res = _run_metric("MMDetectionMAP", [d1, d2], [0.9, 0.8], [0, 0],
                      [gt_a, gt_b], [0, 0], iou_thr=0.3)
    assert res == pytest.approx(0.5)


def test_detection_prefers_highest_iou_unmatched():
    """Among multiple unmatched GTs above threshold, the highest-IoU one is
    taken (greedy, score order)."""
    gts = np.array([[0, 0, 10, 10], [20, 0, 30, 10]], np.float32)
    det = np.array([[0, 0, 10, 10]], np.float32)  # IoU 1.0 vs gt0, 0 vs gt1
    _, tp = _match_image(det, np.array([0.9], np.float32), gts, 0.5)
    assert tp.tolist() == [1.0]


def test_out_of_area_gt_is_ignored_not_removed():
    """A detection matched to an out-of-area GT is ignored (neither TP nor
    FP); with hard filtering it becomes an unmatched FP and drags AP to 0."""
    big_gt = [0, 0, 100, 100]        # area 10000 — outside "small"
    small_gt = [0, 0, 20, 20]        # area 400 — inside "small" (< 32^2)
    d_big = [0, 0, 100, 100]         # matches big_gt, must be ignored
    d_small = [0, 0, 20, 20]         # matches small_gt, TP
    res = _run_metric(
        "CocoEvalMAP",
        [d_big, d_small], [0.95, 0.9], [0, 0],
        [big_gt, small_gt], [0, 0],
        displayed_metrics=["map_small"])
    assert res["map_small"] == pytest.approx(1.0)


def test_unmatched_out_of_area_detection_not_fp():
    """An unmatched detection whose area is outside the bucket is ignored,
    not an FP (pycocotools dtIg |= (dtm==0 & outside))."""
    small_gt = [0, 0, 20, 20]
    d_small = [0, 0, 20, 20]          # TP
    d_big_stray = [200, 200, 400, 400]  # unmatched, outside "small" -> ignored
    res = _run_metric(
        "CocoEvalMAP",
        [d_small, d_big_stray], [0.9, 0.95], [0, 0],
        [small_gt], [0],
        displayed_metrics=["map_small"])
    assert res["map_small"] == pytest.approx(1.0)


def test_double_match_still_fp_when_no_free_gt():
    """Two detections on ONE GT: second is FP (AP = interpolated 1.0 only at
    the recall point covered by the TP; pycocotools trace gives 1.0 for the
    single-threshold VOC metric since precision@recall=1 is max-interpolated)."""
    gt = [0, 0, 10, 10]
    d1, d2 = [0, 0, 10, 10], [1, 0, 11, 10]
    scores, tp = _match_image(
        np.array([d1, d2], np.float32), np.array([0.9, 0.8], np.float32),
        np.array([gt], np.float32), iou_thr=0.5)
    assert tp.tolist() == [1.0, 0.0]


def test_score_order_decides_matching_priority():
    """The higher-scored detection wins the contested GT even when it appears
    later in the input arrays."""
    gt = [0, 0, 10, 10]
    d_low = [0, 0, 10, 10]   # same box, lower score, listed first
    d_high = [0, 0, 10, 10]
    scores, tp = _match_image(
        np.array([d_low, d_high], np.float32),
        np.array([0.3, 0.9], np.float32),
        np.array([gt], np.float32), iou_thr=0.5)
    # tp is aligned to kept detections in input order here; the high-score
    # one must hold the match
    assert tp[np.argmax(scores)] == 1.0 and tp.sum() == 1.0


def test_matched_ignored_gt_consumes_detection_quietly():
    """Fallback to an ignored GT: detection is ignored, and a later lower
    score detection cannot double-count the already-ignored GT."""
    gts = np.array([[0, 0, 10, 10]], np.float32)
    dets = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores, tp = _match_image(
        dets, np.array([0.9, 0.8], np.float32), gts, 0.5,
        gt_ignore=np.array([True]))
    # first det ignored (matched to ignored GT); second det unmatched FP
    # but in-area, so it stays with tp=0
    assert len(scores) == 1 and tp.tolist() == [0.0]
