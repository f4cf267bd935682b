"""Detection mAP evaluation (VOC-style AP@0.5 and COCO-style AP@[.5:.95]).

New first-class subsystem: the reference has no quantitative eval at all —
its only verification is visual overlays (SURVEY.md §4). BASELINE.json's
acceptance criteria are stated in mAP, so this evaluator is the measuring
stick. Pure numpy, no pycocotools dependency (not available in this image).

Conventions: boxes are pixel corner (y1, x1, y2, x2); greedy matching of
score-descending detections to the best unmatched GT with IoU >= thresh
(the standard VOC/COCO protocol, each GT matched at most once).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Sequence

import numpy as np

COCO_IOU_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05))


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lo = np.maximum(a[:, None, :2], b[None, :, :2])
    hi = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(hi - lo, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.maximum(a[:, 2:] - a[:, :2], 0), axis=-1)
    area_b = np.prod(np.maximum(b[:, 2:] - b[:, :2], 0), axis=-1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def average_precision(
    recall: np.ndarray, precision: np.ndarray, mode: str = "area"
) -> float:
    """AP from a PR curve. mode="area": all-points interpolated (VOC2010+/
    COCO); mode="voc07": 11-point."""
    if len(recall) == 0:
        return 0.0
    if mode == "voc07":
        ap = 0.0
        for t in np.linspace(0, 1, 11):
            mask = recall >= t
            ap += (precision[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


class MeanAPEvaluator:
    """Accumulates per-image detections + ground truth, computes mAP."""

    def __init__(self, num_classes: int,
                 iou_thresholds: Sequence[float] = (0.5,)):
        self.num_classes = num_classes
        self.iou_thresholds = tuple(iou_thresholds)
        # per class: list of (score, [n_thresh] tp flags)
        self._dets: dict[int, list] = defaultdict(list)
        self._n_gt = np.zeros(num_classes, np.int64)
        self._img_id = 0

    def add_image(
        self,
        pred_boxes: np.ndarray,
        pred_scores: np.ndarray,
        pred_classes: np.ndarray,
        gt_boxes: np.ndarray,
        gt_classes: np.ndarray,
    ):
        pred_boxes = np.asarray(pred_boxes, np.float32).reshape(-1, 4)
        pred_scores = np.asarray(pred_scores, np.float32).reshape(-1)
        pred_classes = np.asarray(pred_classes, np.int64).reshape(-1)
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
        gt_classes = np.asarray(gt_classes, np.int64).reshape(-1)

        for c in np.unique(gt_classes):
            self._n_gt[c] += int((gt_classes == c).sum())

        order = np.argsort(-pred_scores)
        for c in np.unique(pred_classes):
            det_idx = order[pred_classes[order] == c]
            gt_idx = np.where(gt_classes == c)[0]
            iou = _iou_matrix(pred_boxes[det_idx], gt_boxes[gt_idx])
            n_t = len(self.iou_thresholds)
            matched = np.zeros((n_t, len(gt_idx)), bool)
            for rank, di in enumerate(det_idx):
                tp = np.zeros(n_t, bool)
                for ti, t in enumerate(self.iou_thresholds):
                    cand = np.where(
                        (iou[rank] >= t) & ~matched[ti]
                    )[0]
                    if len(cand):
                        best = cand[np.argmax(iou[rank][cand])]
                        matched[ti, best] = True
                        tp[ti] = True
                self._dets[int(c)].append(
                    (float(pred_scores[di]), tp.copy())
                )
        self._img_id += 1

    def per_class_ap(self) -> np.ndarray:
        """[num_classes, n_thresholds] AP table (nan for absent classes)."""
        n_t = len(self.iou_thresholds)
        aps = np.full((self.num_classes, n_t), np.nan)
        for c in range(self.num_classes):
            n_gt = self._n_gt[c]
            if n_gt == 0:
                continue
            dets = self._dets.get(c, [])
            if not dets:
                aps[c, :] = 0.0
                continue
            dets.sort(key=lambda d: -d[0])
            tp = np.stack([d[1] for d in dets])  # [n_det, n_t]
            for ti in range(n_t):
                cum_tp = np.cumsum(tp[:, ti])
                cum_fp = np.cumsum(~tp[:, ti])
                recall = cum_tp / n_gt
                precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
                aps[c, ti] = average_precision(recall, precision)
        return aps

    def summarize(self) -> dict:
        aps = self.per_class_ap()
        valid = ~np.isnan(aps[:, 0])
        out = {
            "mAP@0.5": float(np.nanmean(aps[:, 0])) if valid.any() else 0.0,
            "per_class_ap50": {
                int(c): float(aps[c, 0])
                for c in range(self.num_classes) if valid[c]
            },
            "num_images": self._img_id,
        }
        if len(self.iou_thresholds) > 1:
            out["mAP@[.5:.95]"] = (
                float(np.nanmean(aps)) if valid.any() else 0.0
            )
        return out


def coco_evaluator(num_classes: int) -> MeanAPEvaluator:
    return MeanAPEvaluator(num_classes, iou_thresholds=COCO_IOU_THRESHOLDS)
