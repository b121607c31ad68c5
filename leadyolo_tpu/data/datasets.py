"""YOLO-format detection dataset with mosaic/HSV/perspective augmentation.

Capability parity with reference utils/dataloaders.py:434-916
(LoadImagesAndLabels): txt/dir image discovery, images->labels path mapping,
npy label cache keyed by file hashes, mosaic4(+mixup) / letterbox training
paths, HSV + flip augmentation. TPU-first difference: __getitem__ returns
FIXED-SHAPE padded target arrays (T_max rows + mask) instead of ragged lists,
so batches feed a static-shape jit step directly.
"""
from __future__ import annotations

import hashlib
import math
import os
import random
from pathlib import Path

import cv2
import numpy as np
import yaml

from .augment import augment_hsv, letterbox, mixup, random_perspective

IMG_FORMATS = ("bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm")
CACHE_VERSION = "leadyolo-tpu-0.2"


def img2label_paths(img_paths):
    """images/ -> labels/, ext -> .txt (reference utils/dataloaders.py:428-431)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def discover_images(path) -> list:
    """Resolve dirs / glob / txt listings to a sorted image list
    (reference utils/dataloaders.py:464-483)."""
    files = []
    for p in path if isinstance(path, (list, tuple)) else [path]:
        p = Path(p)
        if p.is_dir():
            files += [str(f) for f in sorted(p.rglob("*.*"))]
        elif p.is_file() and p.suffix == ".txt":
            parent = str(p.parent) + os.sep
            with open(p) as f:
                lines = f.read().strip().splitlines()
            files += [x.replace("./", parent) if x.startswith("./") else x for x in lines]
        elif p.is_file():
            files.append(str(p))
        else:
            raise FileNotFoundError(p)
    return sorted(x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS)


def check_dataset(data):
    """Resolve a dataset YAML (path rooting, split paths, nc/names) —
    reference utils/general.py:499-563 minus auto-download."""
    if isinstance(data, (str, Path)):
        with open(data) as f:
            d = yaml.safe_load(f)
        d["yaml_file"] = str(data)
    else:
        d = dict(data)
    root = Path(d.get("path") or ".")
    if not root.is_absolute():
        base = Path(d.get("yaml_file", ".")).parent if "yaml_file" in d else Path(".")
        root = (base / root).resolve()
    for k in ("train", "val", "test"):
        if d.get(k):
            if isinstance(d[k], str):
                d[k] = str(root / d[k]) if not Path(d[k]).is_absolute() else d[k]
            else:
                d[k] = [str(root / x) for x in d[k]]
    if "names" in d and isinstance(d["names"], (list, tuple)):
        d["names"] = dict(enumerate(d["names"]))
    d["nc"] = int(d.get("nc") or len(d["names"]))
    return d


def _hash_files(paths) -> str:
    h = hashlib.md5()
    for p in paths:
        try:
            st = os.stat(p)
            h.update(f"{p}{st.st_size}{st.st_mtime_ns}".encode())
        except OSError:
            h.update(p.encode())
    return h.hexdigest()


def load_label_file(path, nc=None):
    """Parse one YOLO label txt -> (n,5) float32 (cls, x, y, w, h)."""
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32)
    with open(path) as f:
        rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
    rows = [r for r in rows if len(r) >= 5]
    if not rows:
        return np.zeros((0, 5), np.float32)
    lb = np.array([r[:5] for r in rows], dtype=np.float32)
    # sanity: normalized, non-negative (reference verify_image_label checks)
    lb[:, 1:] = lb[:, 1:].clip(0, 1)
    if len(lb):
        lb = lb[np.unique(lb, axis=0, return_index=True)[1]] if len(lb) != len(np.unique(lb, axis=0)) else lb
    return lb


class YoloDataset:
    """Detection dataset. ``__getitem__`` -> (img RGB uint8 HWC square,
    labels (n,5) cls+xywh-normalized). Use ``sample(i)`` + ``collate`` for
    fixed-shape padded batches."""

    def __init__(
        self,
        path,
        img_size=640,
        augment=False,
        hyp=None,
        stride=32,
        pad=0.0,
        rect=False,
        max_targets=128,
        cache_dir=None,
        seed=0,
    ):
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.stride = stride
        self.pad = pad
        self.rect = rect
        self.max_targets = max_targets
        self.mosaic = augment and not rect and self.hyp.get("mosaic", 1.0) > 0
        self.mosaic_border = [-img_size // 2, -img_size // 2]
        self.rng = random.Random(seed)

        self.im_files = discover_images(path)
        assert self.im_files, f"no images found in {path}"
        self.label_files = img2label_paths(self.im_files)
        self.labels = self._load_labels(cache_dir)
        self.n = len(self.im_files)
        self.indices = list(range(self.n))

        if rect:
            self._setup_rect_shapes()

    # ---- label cache (reference utils/dataloaders.py:485-512) ----

    def _load_labels(self, cache_dir):
        cache_path = Path(cache_dir or Path(self.label_files[0]).parent).with_suffix(".leadyolo.cache.npy")
        key = _hash_files(self.label_files + self.im_files) + CACHE_VERSION
        if cache_path.is_file():
            try:
                cache = np.load(cache_path, allow_pickle=True).item()
                if cache.get("key") == key:
                    return cache["labels"]
            except Exception:
                pass
        labels = [load_label_file(p) for p in self.label_files]
        try:
            np.save(cache_path, np.array({"key": key, "labels": labels}, dtype=object))
        except OSError:
            pass  # read-only dataset dir: skip caching
        return labels

    def _setup_rect_shapes(self):
        """Aspect-ratio batch bucketing (reference utils/dataloaders.py:544-567),
        simplified to per-image target shapes; the loader groups by shape."""
        shapes = []
        for f in self.im_files:
            im = cv2.imread(f)
            shapes.append(im.shape[:2][::-1])  # w, h
        self.shapes = np.array(shapes, dtype=np.float64)
        ar = self.shapes[:, 1] / self.shapes[:, 0]
        self.indices = np.argsort(ar).tolist()
        self.batch_shapes = None  # computed by the loader given batch size

    # ---- image IO ----

    def load_image(self, i):
        """Load + resize longest side to img_size (reference
        utils/dataloaders.py:718-738). Returns (im BGR, (h0, w0), (h, w))."""
        im = cv2.imread(self.im_files[i])
        assert im is not None, f"image read failure {self.im_files[i]}"
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (math.ceil(w0 * r), math.ceil(h0 * r)), interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    # ---- sample paths ----

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        hyp = self.hyp
        if self.mosaic and self.rng.random() < hyp.get("mosaic", 1.0):
            img, labels = self.load_mosaic(index)
            if self.rng.random() < hyp.get("mixup", 0.0):
                img2, labels2 = self.load_mosaic(self.rng.randint(0, self.n - 1))
                img, labels = mixup(img, labels, img2, labels2)
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape = self.img_size
            img, ratio, pad = letterbox(img, shape, auto=False, scaleup=self.augment)
            labels = self.labels[index].copy()
            if labels.size:
                labels[:, 1:] = self._xywhn2xyxy(labels[:, 1:], ratio[0] * w, ratio[1] * h, pad[0], pad[1])
            if self.augment:
                img, labels = random_perspective(
                    img,
                    labels,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                    rng=self.rng,
                )

        nl = len(labels)
        if nl:
            labels[:, 1:5] = self._xyxy2xywhn(labels[:, 1:5], img.shape[1], img.shape[0])

        if self.augment:
            augment_hsv(
                img, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4), rng=self.rng
            )
            if self.rng.random() < hyp.get("flipud", 0.0):
                img = np.flipud(img)
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
            if self.rng.random() < hyp.get("fliplr", 0.5):
                img = np.fliplr(img)
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]

        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB, HWC
        return img, labels.astype(np.float32)

    @staticmethod
    def _xywhn2xyxy(x, w, h, padw, padh):
        y = np.empty_like(x)
        y[:, 0] = w * (x[:, 0] - x[:, 2] / 2) + padw
        y[:, 1] = h * (x[:, 1] - x[:, 3] / 2) + padh
        y[:, 2] = w * (x[:, 0] + x[:, 2] / 2) + padw
        y[:, 3] = h * (x[:, 1] + x[:, 3] / 2) + padh
        return y

    @staticmethod
    def _xyxy2xywhn(x, w, h):
        y = np.empty_like(x)
        y[:, 0] = ((x[:, 0] + x[:, 2]) / 2) / w
        y[:, 1] = ((x[:, 1] + x[:, 3]) / 2) / h
        y[:, 2] = (x[:, 2] - x[:, 0]) / w
        y[:, 3] = (x[:, 3] - x[:, 1]) / h
        return y

    # ---- mosaic (reference utils/dataloaders.py:750-806) ----

    def load_mosaic(self, index):
        s = self.img_size
        yc, xc = (int(self.rng.uniform(-x, 2 * s + x)) for x in self.mosaic_border)
        indices = [index] + [self.rng.randint(0, self.n - 1) for _ in range(3)]
        self.rng.shuffle(indices)
        labels4 = []
        img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:  # top left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            labels = self.labels[idx].copy()
            if labels.size:
                labels[:, 1:] = self._xywhn2xyxy(labels[:, 1:], w, h, padw, padh)
            labels4.append(labels)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5), np.float32)
        np.clip(labels4[:, 1:], 0, 2 * s, out=labels4[:, 1:])
        img4, labels4 = random_perspective(
            img4,
            labels4,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border,
            rng=self.rng,
        )
        return img4, labels4

    # ---- fixed-shape collate ----

    def collate(self, samples):
        """list of (img, labels) -> images (B,H,W,3) uint8, targets (B,T,5),
        tmask (B,T) — static shapes for the jit step."""
        imgs = np.stack([s[0] for s in samples])
        b = len(samples)
        t = self.max_targets
        targets = np.zeros((b, t, 5), np.float32)
        tmask = np.zeros((b, t), bool)
        for i, (_, lb) in enumerate(samples):
            n = min(len(lb), t)
            if n:
                targets[i, :n] = lb[:n]
                tmask[i, :n] = True
        return imgs, targets, tmask
