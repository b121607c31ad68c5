"""Host-side image augmentation: letterbox, HSV, perspective, mosaic helpers.

Capability parity with reference utils/augmentations.py (letterbox :111-141,
random_perspective :144-237, augment_hsv :67-80, copy_paste :240-259, cutout
:262-286, mixup :289-294). These run on CPU in loader workers feeding the
device; geometry and rounding follow the reference exactly (cv2 INTER_LINEAR,
114-gray padding, BGR color space during augmentation) because small
preprocessing diffs shift mAP (SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

import math
import random

import cv2
import numpy as np


def letterbox(im, new_shape=(640, 640), color=(114, 114, 114), auto=True, scale_fill=False, scaleup=True, stride=32):
    """Aspect-preserving resize + pad. Returns (im, ratio, (dw, dh))."""
    shape = im.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)

    ratio = r, r
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = np.mod(dw, stride), np.mod(dh, stride)
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = new_shape[1] / shape[1], new_shape[0] / shape[0]

    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)


def augment_hsv(im, hgain=0.5, sgain=0.5, vgain=0.5, rng: random.Random | None = None):
    """In-place LUT-based HSV jitter on a BGR uint8 image."""
    if hgain or sgain or vgain:
        rng = rng or random
        r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(im.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(im.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(im.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=im)
    return im


def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter warped boxes: min size, aspect, area retention
    (reference utils/augmentations.py:226-237)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(
    im,
    targets=(),
    segments=(),
    degrees=0,
    translate=0.1,
    scale=0.1,
    shear=0,
    perspective=0.0,
    border=(0, 0),
    rng: random.Random | None = None,
):
    """Combined center/perspective/rotate-scale/shear/translate warp of image
    + xyxy-pixel targets (cls, x1, y1, x2, y2)."""
    rng = rng or random
    height = im.shape[0] + border[0] * 2
    width = im.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -im.shape[1] / 2
    C[1, 2] = -im.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.10)
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
    return im, targets


def mixup(im, labels, im2, labels2, rng=None):
    """Beta(32,32) image blend (reference utils/augmentations.py:289-294)."""
    r = np.random.beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    labels = np.concatenate((labels, labels2), 0)
    return im, labels


def cutout(im, labels, p=0.5, rng: random.Random | None = None):
    """Random erasing with label removal for heavily-obscured boxes
    (reference utils/augmentations.py:262-286)."""
    rng = rng or random
    if rng.random() < p:
        h, w = im.shape[:2]
        scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
        for s in scales:
            mask_h = rng.randint(1, int(h * s))
            mask_w = rng.randint(1, int(w * s))
            xmin = max(0, rng.randint(0, w) - mask_w // 2)
            ymin = max(0, rng.randint(0, h) - mask_h // 2)
            xmax = min(w, xmin + mask_w)
            ymax = min(h, ymin + mask_h)
            im[ymin:ymax, xmin:xmax] = [rng.randint(64, 191) for _ in range(3)]
            if len(labels) and s > 0.03:
                from ..ops.iou import bbox_ioa as _  # noqa: F401  (jax variant exists; numpy below)

                box = np.array([xmin, ymin, xmax, ymax], dtype=np.float32)
                b = labels[:, 1:5]
                inter = (np.minimum(box[2], b[:, 2]) - np.maximum(box[0], b[:, 0])).clip(0) * (
                    np.minimum(box[3], b[:, 3]) - np.maximum(box[1], b[:, 1])
                ).clip(0)
                area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) + 1e-16
                labels = labels[inter / area < 0.60]
    return im, labels


def copy_paste(im, labels, segments, p=0.5, rng: random.Random | None = None):
    """Segment copy-paste (reference utils/augmentations.py:240-259); no-op
    without segments, like the reference on box-only datasets."""
    n = len(segments)
    if p and n:
        rng = rng or random
        h, w, _ = im.shape
        im_new = np.zeros(im.shape, np.uint8)
        for j in rng.sample(range(n), k=round(p * n)):
            l, seg = labels[j], segments[j]
            box = w - l[3], l[2], w - l[1], l[4]
            b = labels[:, 1:5]
            inter = (np.minimum(box[2], b[:, 2]) - np.maximum(box[0], b[:, 0])).clip(0) * (
                np.minimum(box[3], b[:, 3]) - np.maximum(box[1], b[:, 1])
            ).clip(0)
            ioa = inter / ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) + 1e-16)
            if (ioa < 0.30).all():
                labels = np.concatenate((labels, [[l[0], *box]]), 0)
                segments.append(np.concatenate((w - seg[:, 0:1], seg[:, 1:2]), 1))
                cv2.drawContours(im_new, [segments[j].astype(np.int32)], -1, (1, 1, 1), cv2.FILLED)
        result = cv2.flip(im, 1)
        i = cv2.flip(im_new, 1).astype(bool)
        im[i] = result[i]
    return im, labels, segments
