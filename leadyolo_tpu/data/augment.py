"""Host-side image augmentation for the loader workers.

Behavioral counterpart of the reference's augmentation module
(utils/augmentations.py:22-294): aspect-preserving letterbox, LUT-based HSV
jitter, combined affine/perspective warp, cutout, segment copy-paste, mixup.

The *numeric contract* — cv2 INTER_LINEAR resize, 114-gray padding, BGR color
space during augmentation, warp-matrix composition order, rounding, and the
seeded RNG draw order — is preserved exactly, because small preprocessing
diffs shift mAP (SURVEY.md §7 hard part 4). It is pinned bit-for-bit by
tests/test_augment_golden.py; restructure freely under that gate.
"""
from __future__ import annotations

import functools
import math
import operator
import random
from dataclasses import dataclass

import cv2
import numpy as np

GRAY = (114, 114, 114)  # pad/fill value the detector was trained around


# ---------------------------------------------------------------------------
# letterbox
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LetterboxGeom:
    """Geometry of an aspect-preserving fit of ``shape`` into ``target``."""

    ratio: tuple  # (rw, rh) applied to the source
    unpad: tuple  # (w, h) of the resized-but-unpadded image
    pad: tuple  # (dw, dh) — HALF padding per side, may be fractional

    @classmethod
    def fit(cls, shape, target, auto=True, scale_fill=False, scaleup=True, stride=32):
        h, w = shape
        th, tw = (target, target) if isinstance(target, int) else target
        r = min(th / h, tw / w)
        if not scaleup:  # eval: only shrink (keeps mAP, reference behavior)
            r = min(r, 1.0)
        unpad = int(round(w * r)), int(round(h * r))
        dw, dh = tw - unpad[0], th - unpad[1]
        ratio = (r, r)
        if auto:  # minimal stride-aligned canvas instead of the full target
            dw, dh = dw % stride, dh % stride
        elif scale_fill:  # stretch, no padding at all
            dw, dh, unpad, ratio = 0.0, 0.0, (tw, th), (tw / w, th / h)
        return cls(ratio=ratio, unpad=unpad, pad=(dw / 2, dh / 2))

    def borders(self):
        """Integer per-side borders; the +-0.1 nudge splits odd padding the
        same way the reference rounds it."""
        dw, dh = self.pad
        return (
            int(round(dh - 0.1)),
            int(round(dh + 0.1)),
            int(round(dw - 0.1)),
            int(round(dw + 0.1)),
        )


def letterbox(im, new_shape=(640, 640), color=GRAY, auto=True, scale_fill=False, scaleup=True, stride=32):
    """Aspect-preserving resize + gray pad. Returns (im, ratio, (dw, dh))."""
    g = LetterboxGeom.fit(im.shape[:2], new_shape, auto, scale_fill, scaleup, stride)
    if im.shape[1::-1] != g.unpad:
        im = cv2.resize(im, g.unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom, left, right = g.borders()
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, g.ratio, g.pad


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def augment_hsv(im, hgain=0.5, sgain=0.5, vgain=0.5, rng: random.Random | None = None):
    """In-place LUT-based HSV jitter on a BGR uint8 image. Hue wraps mod 180
    (cv2's H range); S/V saturate at 255."""
    if not (hgain or sgain or vgain):
        return im
    rng = rng or random
    gains = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
    ramp = np.arange(0, 256, dtype=gains.dtype)
    tables = (
        ((ramp * gains[0]) % 180).astype(im.dtype),
        np.clip(ramp * gains[1], 0, 255).astype(im.dtype),
        np.clip(ramp * gains[2], 0, 255).astype(im.dtype),
    )
    channels = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))
    jittered = cv2.merge(tuple(cv2.LUT(c, t) for c, t in zip(channels, tables)))
    cv2.cvtColor(jittered, cv2.COLOR_HSV2BGR, dst=im)
    return im


# ---------------------------------------------------------------------------
# geometric warp
# ---------------------------------------------------------------------------


def _ioa(box, boxes, eps=1e-16):
    """Intersection of ``box`` (4,) over the area of each of ``boxes`` (n,4)."""
    iw = (np.minimum(box[2], boxes[:, 2]) - np.maximum(box[0], boxes[:, 0])).clip(0)
    ih = (np.minimum(box[3], boxes[:, 3]) - np.maximum(box[1], boxes[:, 1])).clip(0)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) + eps
    return iw * ih / area


def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Which warped boxes survive: min size, bounded aspect ratio, and enough
    of the pre-warp area retained. Boxes are (4, n) xyxy."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    aspect = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    kept_area = w2 * h2 / (w1 * h1 + eps)
    return (w2 > wh_thr) & (h2 > wh_thr) & (kept_area > area_thr) & (aspect < ar_thr)


def _sample_warp(rng, src_w, src_h, out_w, out_h, degrees, translate, scale, shear, perspective):
    """Sample the combined warp matrix: translate @ shear @ rot-scale @
    perspective @ recenter. The rng draw order (perspective xy, angle, scale,
    shear xy, translate xy) is part of the seeded contract. Returns (M, s)."""
    recenter = np.eye(3)
    recenter[:2, 2] = (-src_w / 2, -src_h / 2)

    proj = np.eye(3)
    proj[2, 0] = rng.uniform(-perspective, perspective)
    proj[2, 1] = rng.uniform(-perspective, perspective)

    angle = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    rot = np.eye(3)
    rot[:2] = cv2.getRotationMatrix2D(angle=angle, center=(0, 0), scale=s)

    sh = np.eye(3)
    sh[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    sh[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    trans = np.eye(3)
    trans[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * out_w
    trans[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * out_h

    return functools.reduce(operator.matmul, (trans, sh, rot, proj, recenter)), s


def _warp_box_envelopes(M, boxes, perspective, out_w, out_h):
    """Warp xyxy boxes' 4 corners through M and take the axis-aligned
    envelope, clipped to the output canvas. boxes (n,4) -> (n,4)."""
    n = len(boxes)
    corners = np.ones((n * 4, 3))
    corners[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
    pts = corners @ M.T
    pts = (pts[:, :2] / pts[:, 2:3] if perspective else pts[:, :2]).reshape(n, 4, 2)
    env = np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=1)
    env[:, 0::2] = env[:, 0::2].clip(0, out_w)
    env[:, 1::2] = env[:, 1::2].clip(0, out_h)
    return env


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
    """Combined recenter/perspective/rotate-scale/shear/translate warp of an
    image and its (cls, x1, y1, x2, y2) pixel targets. ``border`` < 0 crops
    (the mosaic case: canvas shrinks back to the train size)."""
    rng = rng or random
    out_h = im.shape[0] + border[0] * 2
    out_w = im.shape[1] + border[1] * 2

    M, s = _sample_warp(
        rng, im.shape[1], im.shape[0], out_w, out_h, degrees, translate, scale, shear, perspective
    )
    if (border[0], border[1]) != (0, 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(out_w, out_h), borderValue=GRAY)
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(out_w, out_h), borderValue=GRAY)

    # Segment-aware path (reference utils/segment/augmentations.py:random_
    # perspective): when every target carries a polygon, warp the polygon
    # points and re-derive boxes from their extents — tighter than warping
    # box envelopes, and the masks stay aligned with the image warp.
    use_segments = len(segments) and len(segments) == len(targets)
    if use_segments:
        new_segments = []
        boxes = np.zeros((len(targets), 4), np.float32)
        for j, seg in enumerate(segments):
            pts = np.ones((len(seg), 3), np.float32)
            pts[:, :2] = seg
            pts = pts @ M.T.astype(np.float32)
            pts = pts[:, :2] / pts[:, 2:3] if perspective else pts[:, :2]
            pts[:, 0] = pts[:, 0].clip(0, out_w)
            pts[:, 1] = pts[:, 1].clip(0, out_h)
            new_segments.append(pts)
            boxes[j] = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        keep = box_candidates(box1=targets[:, 1:5].T * s, box2=boxes.T, area_thr=0.01)
        targets = targets[keep]
        targets[:, 1:5] = boxes[keep]
        kept_segments = [sg for j, sg in enumerate(new_segments) if keep[j]]
        return im, targets, kept_segments
    if len(targets):
        warped = _warp_box_envelopes(M, targets[:, 1:5], perspective, out_w, out_h)
        keep = box_candidates(box1=targets[:, 1:5].T * s, box2=warped.T, area_thr=0.10)
        targets = targets[keep]
        targets[:, 1:5] = warped[keep]
    # arity contract: callers that opt into segments (pass a list) always get
    # the 3-tuple back, even when the warp fell back to box envelopes;
    # box-only callers (default segments=()) keep the 2-tuple API
    return (im, targets, []) if isinstance(segments, list) else (im, targets)


# ---------------------------------------------------------------------------
# mixing / erasing
# ---------------------------------------------------------------------------


def mixup(im, labels, im2, labels2, rng: random.Random | None = None):
    """Beta(32,32) image blend; labels concatenate."""
    r = rng.betavariate(32.0, 32.0) if rng is not None else np.random.beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    return im, np.concatenate((labels, labels2), 0)


# patch-size schedule: one half-size patch, two quarters, ... sixteen 1/32nds
CUTOUT_SCALES = np.repeat([0.5, 0.25, 0.125, 0.0625, 0.03125], [1, 2, 4, 8, 16])


def cutout(im, labels, p=0.5, rng: random.Random | None = None):
    """Random erasing; labels whose box is >60%% obscured are dropped. The rng
    draw order per patch (h, w, x, y, then 3 color channels) is part of the
    seeded contract."""
    rng = rng or random
    if rng.random() >= p:
        return im, labels
    h, w = im.shape[:2]
    for frac in CUTOUT_SCALES:
        ph = rng.randint(1, int(h * frac))
        pw = rng.randint(1, int(w * frac))
        x0 = max(0, rng.randint(0, w) - pw // 2)
        y0 = max(0, rng.randint(0, h) - ph // 2)
        x1, y1 = min(w, x0 + pw), min(h, y0 + ph)
        im[y0:y1, x0:x1] = [rng.randint(64, 191) for _ in range(3)]
        if len(labels) and frac > 0.03:
            patch = np.array([x0, y0, x1, y1], np.float32)
            labels = labels[_ioa(patch, labels[:, 1:5]) < 0.60]
    return im, labels


def copy_paste(im, labels, segments, p=0.5, rng: random.Random | None = None):
    """Paste horizontally-mirrored segment instances onto the image wherever
    they overlap existing boxes by <30%% IoA. No-op without segments (box-only
    datasets). Mutates ``segments`` by appending the mirrored polygons."""
    n = len(segments)
    if not (p and n):
        return im, labels, segments
    rng = rng or random
    h, w = im.shape[:2]
    paste_mask = np.zeros(im.shape, np.uint8)
    for j in rng.sample(range(n), k=round(p * n)):
        row, seg = labels[j], segments[j]
        mirrored = (w - row[3], row[2], w - row[1], row[4])  # x-flipped box
        if (_ioa(np.array(mirrored), labels[:, 1:5]) < 0.30).all():
            labels = np.concatenate((labels, [[row[0], *mirrored]]), 0)
            segments.append(np.concatenate((w - seg[:, 0:1], seg[:, 1:2]), 1))
            cv2.drawContours(paste_mask, [seg.astype(np.int32)], -1, (1, 1, 1), cv2.FILLED)
    flipped = cv2.flip(im, 1)
    sel = cv2.flip(paste_mask, 1).astype(bool)
    im[sel] = flipped[sel]
    return im, labels, segments


# ---------------------------------------------------------------------------
# optional photometric pipeline (reference Albumentations wrapper)
# ---------------------------------------------------------------------------


class PhotometricAugment:
    """Rare photometric corruptions applied under ``augment=True``.

    Capability counterpart of the reference's optional Albumentations wrapper
    (utils/augmentations.py:22-52): Blur / MedianBlur / ToGray / CLAHE each at
    p=0.01, label-preserving. The reference silently no-ops when the package
    isn't installed; here the same default transforms are first-party cv2, so
    the capability is always present. If the ``albumentations`` package IS
    importable, it is used instead (same transform set, same probabilities),
    preserving the reference's extension point.
    """

    def __init__(self, p: float = 0.01):
        self.p = p
        self._alb = None
        try:  # optional dependency, reference parity
            import albumentations as A

            self._alb = A.Compose(
                [A.Blur(p=p), A.MedianBlur(p=p), A.ToGray(p=p), A.CLAHE(p=p)],
                bbox_params=A.BboxParams(format="yolo", label_fields=["class_labels"]),
            )
        except ImportError:
            pass

    def __call__(self, im, labels, rng: random.Random | None = None):
        """``labels`` are (n, 5) cls+xywhn; photometric ops never move boxes."""
        rng = rng or random
        if self._alb is not None:
            out = self._alb(image=im, bboxes=labels[:, 1:], class_labels=labels[:, 0])
            im = out["image"]
            if len(out["bboxes"]):
                labels = np.array([[c, *b] for c, b in zip(out["class_labels"], out["bboxes"])], np.float32)
            return im, labels
        if rng.random() < self.p:  # box blur, random odd kernel 3..7
            k = 2 * rng.randint(1, 3) + 1
            im = cv2.blur(im, (k, k))
        if rng.random() < self.p:  # median blur
            k = 2 * rng.randint(1, 3) + 1
            im = cv2.medianBlur(im, k)
        if rng.random() < self.p:  # to-gray (replicated to 3 channels)
            im = cv2.cvtColor(cv2.cvtColor(im, cv2.COLOR_BGR2GRAY), cv2.COLOR_GRAY2BGR)
        if rng.random() < self.p:  # CLAHE on the luma plane
            yuv = cv2.cvtColor(im, cv2.COLOR_BGR2YUV)
            yuv[..., 0] = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8)).apply(yuv[..., 0])
            im = cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR)
        return im, labels
