"""Segmentation dataset: polygon labels -> boxes + overlap mask index maps.

Capability parity with reference utils/segment/dataloaders.py
(LoadImagesAndLabelsAndMasks, overlap_mask mode): YOLO-seg label rows are
``cls x1 y1 x2 y2 ...`` normalized polygon points; boxes derive from polygon
extents; masks rasterize to an overlap index map at 1/4 resolution matching
the Proto output. Augmentation: mosaic4/mosaic9 with segment-accurate warping
(reference utils/segment/dataloaders.py:99-134 + segment/augmentations.py),
copy-paste, HSV, and flips with segments tracked throughout.
"""
from __future__ import annotations

import os

import numpy as np

from ..ops.masks import polygons2masks_overlap
from .augment import augment_hsv, letterbox
from .datasets import YoloDataset, img2label_paths


def load_seg_label_file(path):
    """-> (labels (n,5) cls+xywhn, segments list of (m,2) normalized)."""
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32), []
    with open(path) as f:
        rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
    labels, segments = [], []
    for r in rows:
        if len(r) <= 5:  # box-only row
            labels.append([float(v) for v in r[:5]])
            segments.append(None)
        else:
            cls = float(r[0])
            pts = np.array(r[1:], np.float32).reshape(-1, 2)
            x1, y1 = pts.min(0)
            x2, y2 = pts.max(0)
            labels.append([cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
            segments.append(pts)
    return np.array(labels, np.float32).reshape(-1, 5), segments


def _rect_polygon(xywhn):
    """4-corner normalized polygon covering a (cls-less) xywhn box — the mask
    interpretation of a box-only label row."""
    cx, cy, w, h = xywhn
    return np.array(
        [[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
         [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2]],
        np.float32,
    )


class SegmentDataset(YoloDataset):
    """__getitem__ -> (img RGB uint8, labels (n,5), mask_index_map (s/d, s/d))."""

    def __init__(self, *args, downsample_ratio: int = 4, **kwargs):
        self.downsample_ratio = downsample_ratio
        super().__init__(*args, **kwargs)
        # box-only rows get rectangle polygons so every label has a mask and
        # the mosaic warp can track segments for all of them
        for i in range(self.n):
            segs = self.segments[i]
            for j, sg in enumerate(segs):
                if sg is None:
                    segs[j] = _rect_polygon(self.labels[i][j, 1:5])

    def __getitem__(self, index):
        hyp = self.hyp
        s = self.img_size
        if self.mosaic and self.rng.random() < hyp.get("mosaic", 1.0):
            build = self.load_mosaic9 if self.rng.random() < hyp.get("mosaic9", 0.0) else self.load_mosaic
            img, labels, segs = build(index)  # labels xyxy px, segs px
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            img, ratio, pad = letterbox(img, s, auto=False, scaleup=self.augment)
            labels = self.labels[index].copy()
            scale = np.array([ratio[0] * w, ratio[1] * h], np.float32)
            segs = [sg * scale + np.array(pad, np.float32) for sg in self.segments[index]]
            if labels.size:
                labels[:, 1:] = self._xywhn2xyxy(labels[:, 1:], ratio[0] * w, ratio[1] * h, pad[0], pad[1])

        if self.augment:
            augment_hsv(img, hyp.get("hsv_h", 0.0), hyp.get("hsv_s", 0.0), hyp.get("hsv_v", 0.0), rng=self.rng)
            if self.rng.random() < hyp.get("flipud", 0.0):
                img = np.flipud(img)
                if labels.size:
                    labels[:, [2, 4]] = img.shape[0] - labels[:, [4, 2]]
                segs = [np.stack([sg[:, 0], img.shape[0] - sg[:, 1]], 1) if len(sg) else sg for sg in segs]
            if self.rng.random() < hyp.get("fliplr", 0.5):
                img = np.fliplr(img)
                if labels.size:
                    labels[:, [1, 3]] = img.shape[1] - labels[:, [3, 1]]
                segs = [np.stack([img.shape[1] - sg[:, 0], sg[:, 1]], 1) if len(sg) else sg for sg in segs]

        # overlap index map in label-slot order: pixel = slot + 1
        d = self.downsample_ratio
        mask_map = np.zeros((s // d, s // d), np.int32)
        polys = [sg for sg in segs if len(sg)]
        slot_of = [i for i, sg in enumerate(segs) if len(sg)]
        if polys:
            overlap, _ = polygons2masks_overlap((s, s), polys, downsample_ratio=d)
            # overlap pixels hold (polys index + 1); remap to (label slot + 1)
            remap = np.zeros(len(polys) + 1, np.int32)
            for pi, slot in enumerate(slot_of):
                remap[pi + 1] = slot + 1
            mask_map = remap[overlap]

        nl = len(labels)
        if nl:
            labels[:, 1:5] = self._xyxy2xywhn(labels[:, 1:5], img.shape[1], img.shape[0])
        img = np.ascontiguousarray(img[:, :, ::-1])
        return img, labels.astype(np.float32), mask_map

    def collate(self, samples):
        imgs = np.stack([s[0] for s in samples])
        b, t = len(samples), self.max_targets
        targets = np.zeros((b, t, 5), np.float32)
        tmask = np.zeros((b, t), bool)
        maps = np.stack([s[2] for s in samples])
        for i, (_, lb, _) in enumerate(samples):
            n = min(len(lb), t)
            if n:
                targets[i, :n] = lb[:n]
                tmask[i, :n] = True
        # clip map indices beyond the target budget
        maps = np.where(maps > t, 0, maps)
        return imgs, targets, tmask, maps
