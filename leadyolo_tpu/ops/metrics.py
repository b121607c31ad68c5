"""Evaluation metrics: AP, PR curves, confusion matrix, fitness.

Capability parity with reference utils/metrics.py:17-219 (ap_per_class /
compute_ap / ConfusionMatrix) and val.py:79-101 (process_batch greedy IoU
matching). This is host-side numpy — eval bookkeeping over already-collected
detections, not a hot path; the hot path (forward/decode/NMS) stays on device.
"""
from __future__ import annotations

import numpy as np


def fitness(results: np.ndarray) -> float:
    """Weighted [P, R, mAP50, mAP50-95] -> scalar (reference utils/metrics.py:17-20)."""
    w = np.array([0.0, 0.0, 0.1, 0.9])
    return float((np.asarray(results)[:4] * w).sum())


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Box-filter smoothing with edge replication over a fraction ``f`` of the
    curve (reference utils/general.py smooth)."""
    nf = round(len(y) * f * 2) // 2 + 1  # odd kernel size
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]))
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


def box_iou_np(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(N,4),(M,4) xyxy -> (N,M) IoU, numpy."""
    a1, a2 = np.split(box1[:, None, :], 2, axis=2)
    b1, b2 = np.split(box2[None, :, :], 2, axis=2)
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(2)
    area1 = (a2 - a1).prod(2)
    area2 = (b2 - b1).prod(2)
    return inter / (area1 + area2 - inter + eps)


def process_batch(detections: np.ndarray, labels: np.ndarray, iouv: np.ndarray) -> np.ndarray:
    """Per-image TP matrix at the 10 IoU thresholds (reference val.py:79-101).

    detections (N,6): x1,y1,x2,y2,conf,cls ; labels (M,5): cls,x1,y1,x2,y2.
    Returns bool (N, len(iouv)).
    """
    correct = np.zeros((detections.shape[0], iouv.shape[0]), dtype=bool)
    if detections.shape[0] == 0 or labels.shape[0] == 0:
        return correct
    iou = box_iou_np(labels[:, 1:], detections[:, :4])
    correct_class = labels[:, 0:1] == detections[None, :, 5]
    for i in range(len(iouv)):
        x = np.nonzero((iou >= iouv[i]) & correct_class)
        if x[0].shape[0]:
            matches = np.stack([x[0], x[1], iou[x[0], x[1]]], axis=1)
            if x[0].shape[0] > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), i] = True
    return correct


def compute_ap(recall, precision):
    """AP from PR points by 101-pt interpolation (reference utils/metrics.py:96-123).

    Returns (ap, mpre, mrec).
    """
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x) if hasattr(np, "trapezoid") else np.trapz(np.interp(x, mrec, mpre), x)
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls, eps: float = 1e-16):
    """Per-class AP across IoU thresholds (reference utils/metrics.py:31-93).

    tp (N, niou) bool, conf (N,), pred_cls (N,), target_cls (M,).
    Returns dict with p, r, ap (nc, niou), f1, ap50, ap, unique_classes —
    p/r/f1 evaluated at the max-F1 confidence like the reference.
    """
    i = np.argsort(-conf)
    tp, conf, pred_cls = tp[i], conf[i], pred_cls[i]
    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]

    px = np.linspace(0, 1, 1000)
    ap = np.zeros((nc, tp.shape[1]))
    p_curve = np.zeros((nc, 1000))
    r_curve = np.zeros((nc, 1000))
    pr_curve = np.zeros((nc, 1000))  # precision vs recall grid (for PR plots)

    for ci, c in enumerate(unique_classes):
        ic = pred_cls == c
        n_l = nt[ci]
        n_p = ic.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[ic]).cumsum(0)
        tpc = tp[ic].cumsum(0)
        recall = tpc / (n_l + eps)
        precision = tpc / (tpc + fpc)
        # negative-x interp like the reference (conf descending)
        r_curve[ci] = np.interp(-px, -conf[ic], recall[:, 0], left=0)
        p_curve[ci] = np.interp(-px, -conf[ic], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], mpre, mrec = compute_ap(recall[:, j], precision[:, j])
            if j == 0:
                pr_curve[ci] = np.interp(px, mrec, mpre)

    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    # pick the working point on a box-smoothed mean-F1 curve (reference
    # utils/metrics.py:92 smooth(f1.mean(0), 0.1)) — raw argmax is noisy
    i_best = int(smooth(f1_curve.mean(0), 0.1).argmax())
    p, r, f1 = p_curve[:, i_best], r_curve[:, i_best], f1_curve[:, i_best]
    return {
        "p": p,
        "r": r,
        "f1": f1,
        "ap": ap,
        "ap50": ap[:, 0],
        "ap_mean": ap.mean(1),
        "unique_classes": unique_classes.astype(int),
        "px": px,
        "p_curve": p_curve,
        "r_curve": r_curve,
        "f1_curve": f1_curve,
        "pr_curve": pr_curve,
    }


class ConfusionMatrix:
    """Detection confusion matrix (reference utils/metrics.py:126-219)."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.matrix = np.zeros((nc + 1, nc + 1))
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres

    def process_batch(self, detections, labels):
        """detections (N,6) xyxy,conf,cls; labels (M,5) cls,xyxy."""
        if detections is None or detections.shape[0] == 0:
            for c in labels[:, 0].astype(int):
                self.matrix[self.nc, c] += 1  # background FN
            return
        detections = detections[detections[:, 4] > self.conf]
        gt_classes = labels[:, 0].astype(int)
        det_classes = detections[:, 5].astype(int)
        if labels.shape[0]:
            iou = box_iou_np(labels[:, 1:], detections[:, :4])
            x = np.nonzero(iou > self.iou_thres)
            if x[0].shape[0]:
                matches = np.stack([x[0], x[1], iou[x[0], x[1]]], axis=1)
                if x[0].shape[0] > 1:
                    matches = matches[matches[:, 2].argsort()[::-1]]
                    matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                    matches = matches[matches[:, 2].argsort()[::-1]]
                    matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            else:
                matches = np.zeros((0, 3))
        else:
            matches = np.zeros((0, 3))

        n = matches.shape[0] > 0
        m0, m1, _ = matches.transpose().astype(int) if n else (np.empty(0, int),) * 3
        for i, gc in enumerate(gt_classes):
            j = m0 == i
            if n and j.sum() == 1:
                self.matrix[det_classes[m1[j]][0], gc] += 1  # correct / confused
            else:
                self.matrix[self.nc, gc] += 1  # background FN
        for i, dc in enumerate(det_classes):
            if not n or not (m1 == i).any():
                self.matrix[dc, self.nc] += 1  # background FP

    def tp_fp(self):
        tp = self.matrix.diagonal()
        fp = self.matrix.sum(1) - tp
        return tp[:-1], fp[:-1]
