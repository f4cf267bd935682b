import numpy as np
import pytest

from detectax.eval.detection_metrics import (
    MeanAPEvaluator,
    average_precision,
    coco_evaluator,
)


def test_average_precision_perfect():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert average_precision(r, p) == pytest.approx(1.0)


def test_average_precision_half():
    # one TP then one FP over 1 GT -> recall hits 1.0 at precision 1.0
    r = np.array([1.0, 1.0])
    p = np.array([1.0, 0.5])
    assert average_precision(r, p) == pytest.approx(1.0)
    # FP first: recall 0 @ p=0, then TP
    r = np.array([0.0, 1.0])
    p = np.array([0.0, 0.5])
    assert average_precision(r, p) == pytest.approx(0.5)


def test_voc07_mode():
    r = np.array([1.0])
    p = np.array([1.0])
    assert average_precision(r, p, mode="voc07") == pytest.approx(1.0)


def test_perfect_detections_map1():
    ev = MeanAPEvaluator(num_classes=3)
    gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)
    ev.add_image(gt, [0.9, 0.8], [0, 1], gt, [0, 1])
    s = ev.summarize()
    assert s["mAP@0.5"] == pytest.approx(1.0)
    assert s["per_class_ap50"] == {0: 1.0, 1: 1.0}


def test_all_misses_map0():
    ev = MeanAPEvaluator(num_classes=2)
    gt = np.array([[10, 10, 50, 50]], np.float32)
    far = np.array([[200, 200, 250, 250]], np.float32)
    ev.add_image(far, [0.9], [0], gt, [0])
    assert ev.summarize()["mAP@0.5"] == pytest.approx(0.0)


def test_wrong_class_is_fp():
    ev = MeanAPEvaluator(num_classes=2)
    gt = np.array([[10, 10, 50, 50]], np.float32)
    ev.add_image(gt, [0.9], [1], gt, [0])
    s = ev.summarize()
    assert s["per_class_ap50"][0] == pytest.approx(0.0)


def test_duplicate_detection_counts_once():
    ev = MeanAPEvaluator(num_classes=1)
    gt = np.array([[10, 10, 50, 50]], np.float32)
    dets = np.array([[10, 10, 50, 50], [11, 11, 51, 51]], np.float32)
    ev.add_image(dets, [0.9, 0.8], [0, 0], gt, [0])
    s = ev.summarize()
    # 1 TP + 1 FP over 1 GT: AP = 1.0 (recall 1 reached at precision 1)
    assert s["per_class_ap50"][0] == pytest.approx(1.0)
    # reversed scores: FP ranked first -> AP 0.5? no: TP second ->
    # precision at recall 1 is 0.5 but all-points interp keeps max ahead
    ev2 = MeanAPEvaluator(num_classes=1)
    ev2.add_image(dets, [0.8, 0.9], [0, 0], gt, [0])
    # higher-scored near-duplicate matches the GT; second is FP -> AP 1.0
    assert ev2.summarize()["per_class_ap50"][0] == pytest.approx(1.0)


def test_localization_quality_affects_coco_ap():
    ev = coco_evaluator(num_classes=1)
    gt = np.array([[0, 0, 100, 100]], np.float32)
    loose = np.array([[0, 0, 100, 60]], np.float32)  # IoU 0.6
    ev.add_image(loose, [0.9], [0], gt, [0])
    s = ev.summarize()
    assert s["mAP@0.5"] == pytest.approx(1.0)
    # matches only at IoU thresholds 0.5, 0.55, 0.6 -> 3/10
    assert s["mAP@[.5:.95]"] == pytest.approx(0.3, abs=1e-6)


def test_multi_image_accumulation():
    ev = MeanAPEvaluator(num_classes=1)
    gt = np.array([[10, 10, 50, 50]], np.float32)
    ev.add_image(gt, [0.9], [0], gt, [0])        # hit
    ev.add_image(np.zeros((0, 4)), [], [], gt, [0])  # miss (no det)
    s = ev.summarize()
    # 1 TP over 2 GT: max recall 0.5 at precision 1.0
    assert s["per_class_ap50"][0] == pytest.approx(0.5)
    assert s["num_images"] == 2


def test_area_binned_ap_isolates_bins():
    """A small GT (20x20=400 < 32^2) and a large GT (200x200 > 96^2), each
    matched perfectly: AP_small and AP_large are both 1.0, AP_medium has no
    GT (None)."""
    ev = MeanAPEvaluator(num_classes=1)
    gt = np.array([[0, 0, 20, 20], [300, 300, 500, 500]], np.float32)
    ev.add_image(gt, [0.9, 0.8], [0, 0], gt, [0, 0])
    s = ev.summarize()
    assert s["AP_small"] == pytest.approx(1.0)
    assert s["AP_large"] == pytest.approx(1.0)
    assert s["AP_medium"] is None
    assert s["AR@100"] == pytest.approx(1.0)


def test_area_binned_ignore_protocol():
    """A detection matching an out-of-bin GT must be IGNORED for that bin
    (not an FP), and an unmatched det outside the bin is ignored too."""
    ev = MeanAPEvaluator(num_classes=1)
    gt = np.array([[0, 0, 20, 20], [300, 300, 500, 500]], np.float32)
    # det 1 hits the small GT; det 2 hits the large GT; det 3 is a large
    # unmatched box (FP for 'large'/'all' but ignored for 'small')
    dets = np.array(
        [[0, 0, 20, 20], [300, 300, 500, 500], [600, 600, 800, 800]],
        np.float32,
    )
    ev.add_image(dets, [0.9, 0.8, 0.7], [0, 0, 0], gt, [0, 0])
    s = ev.summarize()
    # small bin: the large-GT match and the stray large det are both
    # ignored -> perfect PR curve
    assert s["AP_small"] == pytest.approx(1.0)
    # large bin: TP at rank 1, FP at rank 2 -> still AP 1.0 (recall 1
    # reached before the FP)
    assert s["AP_large"] == pytest.approx(1.0)
    # overall recall unaffected by the FP
    assert s["AR@100"] == pytest.approx(1.0)


def test_area_binned_fp_counts_in_own_bin():
    """An unmatched small det IS an FP for the small bin when ranked above
    the TP."""
    ev = MeanAPEvaluator(num_classes=1)
    gt = np.array([[0, 0, 20, 20]], np.float32)
    dets = np.array([[100, 100, 118, 118], [0, 0, 20, 20]], np.float32)
    ev.add_image(dets, [0.9, 0.8], [0, 0], gt, [0])
    s = ev.summarize()
    # FP first, TP second: precision at recall 1.0 is 0.5
    assert s["AP_small"] == pytest.approx(0.5)
    assert s["AR@100"] == pytest.approx(1.0)


def test_ar100_caps_detections():
    """Only the top-100 dets count toward AR@100: a GT matched by det
    ranked 101+ is a miss."""
    ev = MeanAPEvaluator(num_classes=1)
    gt = np.array([[0, 0, 50, 50]], np.float32)
    # 100 high-scoring junk dets far away + 1 low-scoring perfect match
    junk = np.tile(np.array([[500, 500, 540, 540]], np.float32), (100, 1))
    junk += np.arange(100, dtype=np.float32)[:, None] * 50.0
    dets = np.concatenate([junk, gt])
    scores = [0.9] * 100 + [0.1]
    ev.add_image(dets, scores, [0] * 101, gt, [0])
    s = ev.summarize()
    assert s["AR@100"] == pytest.approx(0.0)
    # headline AP is NOT capped (VOC protocol uses everything)
    assert s["per_class_ap50"][0] > 0.0
