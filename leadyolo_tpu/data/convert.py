"""Dataset conversion & splitting helpers.

Capability parity with the reference's data-helper scripts:
utils/coco_to_yolo.py (COCO JSON -> YOLO txt), utils/json_to_yolo.py
(LabelMe JSON -> YOLO txt), utils/split_dataset.py (70/30 splitter), and
utils/dataloaders.py:920-988 (autosplit / extract_boxes).
"""
from __future__ import annotations

import json
import random
import shutil
from pathlib import Path

import numpy as np

IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")


def coco_to_yolo(ann_json, out_dir, category_offset: int = 0):
    """COCO instances JSON -> one YOLO txt per image (cls cx cy w h normalized).

    Reference: utils/coco_to_yolo.py / data/SSDD/labels/coco_to_yolo.py.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(ann_json) as f:
        coco = json.load(f)
    images = {im["id"]: im for im in coco["images"]}
    cat_ids = sorted(c["id"] for c in coco.get("categories", []))
    cat_map = {cid: i + category_offset for i, cid in enumerate(cat_ids)}
    per_image = {}
    for ann in coco["annotations"]:
        im = images[ann["image_id"]]
        w, h = im["width"], im["height"]
        x, y, bw, bh = ann["bbox"]
        row = (
            cat_map.get(ann["category_id"], ann["category_id"]),
            (x + bw / 2) / w,
            (y + bh / 2) / h,
            bw / w,
            bh / h,
        )
        per_image.setdefault(Path(im["file_name"]).stem, []).append(row)
    for stem, rows in per_image.items():
        with open(out_dir / f"{stem}.txt", "w") as f:
            for r in rows:
                f.write("%d %.6f %.6f %.6f %.6f\n" % r)
    return len(per_image)


def labelme_to_yolo(json_dir, out_dir, class_names):
    """LabelMe rectangle JSONs -> YOLO txts (reference utils/json_to_yolo.py)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name_to_id = {n: i for i, n in enumerate(class_names)}
    n = 0
    for jf in Path(json_dir).glob("*.json"):
        with open(jf) as f:
            d = json.load(f)
        w, h = d["imageWidth"], d["imageHeight"]
        rows = []
        for shape in d.get("shapes", []):
            if shape.get("shape_type") != "rectangle" or shape["label"] not in name_to_id:
                continue
            (x1, y1), (x2, y2) = shape["points"]
            x1, x2 = sorted((x1, x2))
            y1, y2 = sorted((y1, y2))
            rows.append(
                (name_to_id[shape["label"]], (x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h)
            )
        if rows:
            with open(out_dir / f"{jf.stem}.txt", "w") as f:
                for r in rows:
                    f.write("%d %.6f %.6f %.6f %.6f\n" % r)
            n += 1
    return n


def split_dataset(img_dir, out_root, ratio: float = 0.7, seed: int = 0, move: bool = False):
    """Random train/test split preserving images/ <-> labels/ pairing
    (reference utils/split_dataset.py, 70/30 default)."""
    img_dir = Path(img_dir)
    out_root = Path(out_root)
    files = sorted(f for f in img_dir.iterdir() if f.suffix.lower() in IMG_EXTS)
    rng = random.Random(seed)
    rng.shuffle(files)
    n_train = int(len(files) * ratio)
    op = shutil.move if move else shutil.copy2
    for split, chunk in (("train", files[:n_train]), ("test", files[n_train:])):
        (out_root / "images" / split).mkdir(parents=True, exist_ok=True)
        (out_root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for f in chunk:
            op(str(f), out_root / "images" / split / f.name)
            lbl = Path(str(f.parent).replace("images", "labels")) / (f.stem + ".txt")
            if lbl.exists():
                op(str(lbl), out_root / "labels" / split / lbl.name)
    return n_train, len(files) - n_train


def autosplit(path, weights=(0.9, 0.1, 0.0), seed: int = 0):
    """Write autosplit_{train,val,test}.txt listings
    (reference utils/dataloaders.py:920-946)."""
    path = Path(path)
    files = sorted(f for f in path.rglob("*.*") if f.suffix.lower() in IMG_EXTS)
    rng = random.Random(seed)
    assignments = rng.choices([0, 1, 2], weights=weights, k=len(files))
    txts = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for t in txts:
        (path.parent / t).unlink(missing_ok=True)
    for f, a in zip(files, assignments):
        with open(path.parent / txts[a], "a") as fh:
            fh.write(f"./{f.relative_to(path.parent)}\n")
    return [int(np.sum(np.array(assignments) == i)) for i in range(3)]


def extract_boxes(path, out_dir=None):
    """Crop every labeled box into a classification folder tree
    (reference utils/dataloaders.py:948-988)."""
    import cv2

    path = Path(path)
    out_dir = Path(out_dir or path.parent / "classification")
    n = 0
    for img_file in sorted(path.rglob("*.*")):
        if img_file.suffix.lower() not in IMG_EXTS:
            continue
        lbl = Path(str(img_file.parent).replace("images", "labels")) / (img_file.stem + ".txt")
        if not lbl.exists():
            continue
        im = cv2.imread(str(img_file))
        if im is None:
            continue
        h, w = im.shape[:2]
        with open(lbl) as f:
            rows = [x.split() for x in f.read().strip().splitlines()]
        for j, r in enumerate(rows):
            c = int(float(r[0]))
            cx, cy, bw, bh = (float(v) for v in r[1:5])
            b = np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]) * [w, h, w, h]
            b[[0, 2]] = b[[0, 2]].clip(0, w)
            b[[1, 3]] = b[[1, 3]].clip(0, h)
            crop = im[int(b[1]) : int(b[3]), int(b[0]) : int(b[2])]
            if crop.size:
                d = out_dir / str(c)
                d.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(d / f"{img_file.stem}_{j}.jpg"), crop)
                n += 1
    return n


def hub_dataset_stats(data_yaml, out_json=None):
    """Dataset statistics JSON: per-split image/instance counts and per-class
    histograms (reference utils/dataloaders.py:1042-1161 HUBDatasetStats)."""
    from .datasets import YoloDataset, check_dataset

    d = check_dataset(data_yaml)
    stats = {"nc": d["nc"], "names": d.get("names"), "splits": {}}
    for split in ("train", "val", "test"):
        if not d.get(split):
            continue
        try:
            ds = YoloDataset(d[split], augment=False)
        except (AssertionError, FileNotFoundError):
            continue
        import numpy as _np

        counts = _np.zeros(d["nc"], int)
        inst = 0
        for lb in ds.labels:
            inst += len(lb)
            for c in lb[:, 0].astype(int):
                if 0 <= c < d["nc"]:
                    counts[c] += 1
        stats["splits"][split] = {
            "images": len(ds),
            "instances": inst,
            "per_class": counts.tolist(),
        }
    if out_json:
        Path(out_json).write_text(json.dumps(stats, indent=1))
    return stats
