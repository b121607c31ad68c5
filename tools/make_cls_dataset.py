"""Build a ship/background crop classification dataset from SSDD.

The reference ships whole classify training runs (classify/train.py:56-269)
on ImageFolder trees; SSDD is single-class, so a pure extract_boxes tree
(data/convert.py, reference utils/dataloaders.py:948-988) would be a
degenerate 1-class problem. This tool makes it a real binary task:

  out/<split>/ship/        every labeled box crop (extract_boxes rule)
  out/<split>/background/  random crops whose IoU with every GT box is 0,
                           sampled from the ship-box size distribution

Usage: python tools/make_cls_dataset.py [--root /root/reference/data/SSDD]
                                        [--out runs/cls_data_ssdd] [--per-img 2]
"""
from __future__ import annotations

import argparse
import os
import random
import sys
from pathlib import Path

import cv2
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")


def _iou_1n(box, boxes):
    if not len(boxes):
        return np.zeros(0)
    boxes = np.asarray(boxes, np.float64)
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-9)


def build_split(img_dir: Path, out: Path, per_img: int, rng: random.Random):
    n_ship = n_bg = 0
    sizes = []  # (w, h) of ship boxes, for the background size distribution
    records = []  # (img path, image, gt xyxy list)
    for f in sorted(img_dir.rglob("*.*")):
        if f.suffix.lower() not in IMG_EXTS:
            continue
        lbl = Path(str(f.parent).replace("images", "labels")) / (f.stem + ".txt")
        if not lbl.exists():
            continue
        im = cv2.imread(str(f))
        if im is None:
            continue
        h, w = im.shape[:2]
        gts = []
        for j, r in enumerate(x.split() for x in lbl.read_text().strip().splitlines()):
            cx, cy, bw, bh = (float(v) for v in r[1:5])
            b = np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]) * [w, h, w, h]
            b[[0, 2]] = b[[0, 2]].clip(0, w)
            b[[1, 3]] = b[[1, 3]].clip(0, h)
            crop = im[int(b[1]): int(b[3]), int(b[0]): int(b[2])]
            if crop.size:
                d = out / "ship"
                d.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(d / f"{f.stem}_{j}.jpg"), crop)
                sizes.append((b[2] - b[0], b[3] - b[1]))
                n_ship += 1
            gts.append(b)
        records.append((f, im, gts))

    for f, im, gts in records:
        h, w = im.shape[:2]
        placed = 0
        for _ in range(30):  # rejection sampling
            if placed >= per_img:
                break
            bw, bh = sizes[rng.randrange(len(sizes))]
            bw, bh = min(bw, w - 1), min(bh, h - 1)
            if bw < 4 or bh < 4:
                continue
            x0 = rng.uniform(0, w - bw)
            y0 = rng.uniform(0, h - bh)
            cand = np.array([x0, y0, x0 + bw, y0 + bh])
            if len(gts) and _iou_1n(cand, gts).max() > 0.0:
                continue  # touches a ship — not background
            crop = im[int(cand[1]): int(cand[3]), int(cand[0]): int(cand[2])]
            if not crop.size:
                continue
            d = out / "background"
            d.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(d / f"{f.stem}_bg{placed}.jpg"), crop)
            n_bg += 1
            placed += 1
    return n_ship, n_bg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference/data/SSDD")
    ap.add_argument("--out", default=os.path.join(_REPO, "runs", "cls_data_ssdd"))
    ap.add_argument("--per-img", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    for split in ("train", "test"):
        src = Path(args.root) / "images" / split
        dst = Path(args.out) / split
        ns, nb = build_split(src, dst, args.per_img, rng)
        print(f"[make_cls_dataset] {split}: {ns} ship crops, {nb} background crops -> {dst}")


if __name__ == "__main__":
    main()
