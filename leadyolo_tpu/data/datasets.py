"""YOLO-format detection dataset with mosaic/HSV/perspective augmentation.

Behavioral counterpart of reference utils/dataloaders.py:434-916
(LoadImagesAndLabels): txt/dir image discovery, images->labels path mapping,
npy label cache keyed by file hashes, parallel image verification with
corrupt-file quarantine, optional RAM/disk image cache, mosaic4/mosaic9
(+mixup, +segment copy-paste) / letterbox training paths, HSV + flip
augmentation, aspect-ratio rect bucketing. TPU-first difference:
``__getitem__`` returns FIXED-SHAPE padded target arrays (T_max rows + mask)
instead of ragged lists, so batches feed a static-shape jit step directly;
rect buckets map to a small closed set of canvas shapes (one XLA compile
per bucket) instead of arbitrary per-batch shapes.
"""
from __future__ import annotations

import hashlib
import math
import os
import random
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import cv2
import numpy as np
import yaml

from .augment import PhotometricAugment, augment_hsv, copy_paste, letterbox, mixup, random_perspective

IMG_FORMATS = ("bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm")
CACHE_VERSION = "leadyolo-tpu-0.3"


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
    """Parse one YOLO label txt.

    Box rows are ``cls x y w h``; polygon rows are ``cls x1 y1 x2 y2 ...``
    (normalized) and yield both a bounding box and a segment polygon.
    Returns (labels (n,5) float32, segments list of (m,2) float32 or None).
    """
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32), []
    with open(path) as f:
        rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
    labels, segments = [], []
    for r in rows:
        if len(r) < 5:
            continue
        if len(r) == 5:
            labels.append([float(v) for v in r])
            segments.append(None)
        else:  # polygon: box = extent (reference segments2boxes)
            pts = np.array(r[1:], np.float32).reshape(-1, 2)
            (x1, y1), (x2, y2) = pts.min(0), pts.max(0)
            labels.append([float(r[0]), (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
            segments.append(pts)
    if not labels:
        return np.zeros((0, 5), np.float32), []
    lb = np.array(labels, np.float32)
    lb[:, 1:] = lb[:, 1:].clip(0, 1)
    if len(lb) != len(np.unique(lb, axis=0)):
        keep = np.unique(lb, axis=0, return_index=True)[1]
        lb = lb[keep]
        segments = [segments[i] for i in keep]
    return lb, segments


def verify_image(path):
    """Header-level image check (reference verify_image_label
    utils/dataloaders.py:990-1040). Returns ((w, h), msg) — msg is an empty
    string when healthy; a non-empty msg with shape=None quarantines the file."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            im.verify()
            w, h = im.size
            fmt = (im.format or "").lower()
        if w <= 9 or h <= 9:
            return None, f"image too small {w}x{h}"
        if fmt not in IMG_FORMATS:
            return None, f"invalid format {fmt}"
        if fmt in ("jpg", "jpeg"):
            with open(path, "rb") as f:
                f.seek(-2, 2)
                if f.read() != b"\xff\xd9":  # truncated JPEG
                    return (w, h), f"corrupt JPEG tail (decoder will restore): {path}"
        return (w, h), ""
    except ImportError:
        # no PIL: fall back to a full decode (slower, still cached)
        im = cv2.imread(str(path))
        if im is None:
            return None, f"unreadable image {path}"
        return (im.shape[1], im.shape[0]), ""
    except Exception as e:
        return None, f"corrupt image {path}: {e}"


class YoloDataset:
    """Detection dataset. ``__getitem__`` -> (img RGB uint8 HWC,
    labels (n,5) cls+xywh-normalized[, shape_meta]). Use ``collate`` for
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
        batch_size=None,
        max_targets=128,
        cache_dir=None,
        cache_images=None,  # None | "ram" | "disk"
        return_shapes=False,
        seed=0,
        log_fn=print,
    ):
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.stride = stride
        self.pad = pad
        self.rect = rect
        self.max_targets = max_targets
        self.return_shapes = return_shapes
        self.log_fn = log_fn
        self.mosaic = augment and not rect and self.hyp.get("mosaic", 1.0) > 0
        # hyp-controlled probability; p=0 removes the stage entirely so it
        # consumes NO rng draws (reproduces the pre-photometric recipe's
        # downstream augment stream exactly — used by the r05 late-training
        # A/B, runs/photometric_ab_r05/)
        _p_pm = float(self.hyp.get("photometric_p", 0.01))
        self.photometric = PhotometricAugment(_p_pm) if augment and _p_pm > 0 else None
        self.mosaic_border = [-img_size // 2, -img_size // 2]
        self.rng = random.Random(seed)

        self.im_files = discover_images(path)
        assert self.im_files, f"no images found in {path}"
        self.label_files = img2label_paths(self.im_files)
        self._build_cache(cache_dir)
        self.n = len(self.im_files)
        self.indices = list(range(self.n))
        self.batch_shapes = None
        self.batch_index = None

        if rect:
            self._setup_rect_shapes(batch_size or 32)

        # optional decoded-image cache (reference utils/dataloaders.py:569-603)
        self._ims = [None] * self.n
        self._npy_files = [None] * self.n
        if cache_images:
            self._cache_images(cache_images)

    # ---- verification + label cache (reference utils/dataloaders.py:485-512, 990-1040) ----

    def _build_cache(self, cache_dir):
        cache_path = Path(cache_dir or Path(self.label_files[0]).parent).with_suffix(".leadyolo.cache.npy")
        key = _hash_files(self.label_files + self.im_files) + CACHE_VERSION
        cache = None
        if cache_path.is_file():
            try:
                loaded = np.load(cache_path, allow_pickle=True).item()
                if loaded.get("key") == key:
                    cache = loaded
            except Exception:
                pass
        if cache is None:
            cache = self._scan(key)
            try:
                np.save(cache_path, np.array(cache, dtype=object))
            except OSError:
                pass  # read-only dataset dir: skip caching
        bad = cache["quarantined"]
        if bad:
            self.log_fn(f"quarantined {len(bad)} corrupt image(s): {bad[:5]}{'...' if len(bad) > 5 else ''}")
            good = [i for i, f in enumerate(self.im_files) if f not in set(bad)]
            self.im_files = [self.im_files[i] for i in good]
            self.label_files = [self.label_files[i] for i in good]
        assert self.im_files, "all images quarantined as corrupt"
        self.labels = cache["labels"]
        self.segments = cache["segments"]
        self.shapes = np.array(cache["shapes"], np.float64)  # (n, 2) w, h

    def _scan(self, key):
        """Parallel verify + parse of every (image, label) pair."""
        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as pool:
            checks = list(pool.map(verify_image, self.im_files))
            parsed = list(pool.map(load_label_file, self.label_files))
        labels, segments, shapes, quarantined = [], [], [], []
        for f, (shape, msg), (lb, segs) in zip(self.im_files, checks, parsed):
            if shape is None:
                quarantined.append(f)
                continue
            if msg:
                self.log_fn(msg)
            labels.append(lb)
            segments.append(segs)
            shapes.append(shape)
        return {
            "key": key,
            "labels": labels,
            "segments": segments,
            "shapes": shapes,
            "quarantined": quarantined,
        }

    # ---- rect bucketing (reference utils/dataloaders.py:544-567) ----

    def _setup_rect_shapes(self, batch_size):
        """Sort by aspect ratio and give every batch the smallest
        stride-aligned canvas that fits its worst member; a handful of static
        shapes keeps XLA recompiles bounded while cutting wasted pixels."""
        ar = self.shapes[:, 1] / self.shapes[:, 0]  # h / w
        order = np.argsort(ar)
        self.im_files = [self.im_files[i] for i in order]
        self.label_files = [self.label_files[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        self.segments = [self.segments[i] for i in order]
        self.shapes = self.shapes[order]
        ar = ar[order]

        nb = int(np.ceil(self.n / batch_size))
        self.batch_index = np.arange(self.n) // batch_size
        canvas = np.ones((nb, 2))  # (h, w) scale factors relative to img_size
        for b in range(nb):
            arb = ar[self.batch_index == b]
            lo, hi = arb.min(), arb.max()
            if hi < 1:  # wide batch: shrink height
                canvas[b] = [hi, 1]
            elif lo > 1:  # tall batch: shrink width
                canvas[b] = [1, 1 / lo]
        self.batch_shapes = (
            np.ceil(canvas * self.img_size / self.stride + self.pad).astype(int) * self.stride
        )

    # ---- image IO (+ optional RAM/disk cache, reference :569-603) ----

    def load_image(self, i):
        """Load + resize longest side to img_size. Returns
        (im BGR, (h0, w0), (h, w))."""
        im = self._ims[i]
        if im is not None:
            return im, tuple(self.shapes[i][::-1].astype(int)), im.shape[:2]
        npy = self._npy_files[i]
        if npy is not None and npy.exists():
            im = np.load(npy)
        else:
            im = cv2.imread(self.im_files[i])
            if im is None:
                raise FileNotFoundError(f"image read failure {self.im_files[i]} (verified at scan time; changed on disk?)")
            h0, w0 = im.shape[:2]
            r = self.img_size / max(h0, w0)
            if r != 1:
                interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
                im = cv2.resize(im, (math.ceil(w0 * r), math.ceil(h0 * r)), interpolation=interp)
            return im, (h0, w0), im.shape[:2]
        return im, tuple(self.shapes[i][::-1].astype(int)), im.shape[:2]

    def _cache_images(self, mode):
        if mode == "ram" and not self._ram_budget_ok():
            self.log_fn("image cache: insufficient free RAM, falling back to uncached reads")
            return
        gb = 0
        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as pool:
            results = pool.map(self.load_image, range(self.n))
            for i, (im, _, _) in enumerate(results):
                if mode == "disk":
                    p = Path(self.im_files[i]).with_suffix(".leadyolo.npy")
                    try:
                        if not p.exists():
                            np.save(p, im)
                        self._npy_files[i] = p
                    except OSError:
                        pass  # read-only dataset dir
                else:
                    self._ims[i] = im
                    gb += im.nbytes
        if mode == "ram":
            self.log_fn(f"image cache: {gb / 1e9:.2f} GB RAM")

    def _ram_budget_ok(self, safety=1.5):
        """Estimated decoded size must fit in available memory (the
        reference's psutil check, without requiring psutil)."""
        sample = [self.load_image(i)[0].nbytes for i in self.rng.sample(range(self.n), min(8, self.n))]
        need = self.n * float(np.mean(sample)) * safety
        try:
            avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        except (ValueError, OSError, AttributeError):
            return True  # can't measure: trust the caller
        return need < avail

    # ---- sample paths ----

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        hyp = self.hyp
        meta = np.zeros(6, np.float32)  # h0, w0, rh, rw, padw, padh
        if self.mosaic and self.rng.random() < hyp.get("mosaic", 1.0):
            build = self.load_mosaic9 if self.rng.random() < hyp.get("mosaic9", 0.0) else self.load_mosaic
            img, labels, _ = build(index)
            if self.rng.random() < hyp.get("mixup", 0.0):
                img2, labels2, _ = build(self.rng.randint(0, self.n - 1))
                img, labels = mixup(img, labels, img2, labels2)
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            if self.rect:
                shape = tuple(self.batch_shapes[self.batch_index[index]])
            else:
                shape = self.img_size
            img, ratio, pad = letterbox(img, shape, auto=False, scaleup=self.augment)
            meta[:] = (h0, w0, ratio[1] * h / h0, ratio[0] * w / w0, pad[0], pad[1])
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
            if self.photometric is not None:
                img, labels = self.photometric(img, labels, rng=self.rng)
            nl = len(labels)
            augment_hsv(
                img, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4), rng=self.rng
            )
            if self.rng.random() < hyp.get("flipud", 0.0):
                img = cv2.flip(img, 0)  # contiguous result; releases the GIL
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
            if self.rng.random() < hyp.get("fliplr", 0.5):
                img = cv2.flip(img, 1)
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]

        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)  # contiguous; releases the GIL
        img = np.ascontiguousarray(img) if not img.flags["C_CONTIGUOUS"] else img
        if self.return_shapes:
            return img, labels.astype(np.float32), meta
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

    # ---- mosaics (reference utils/dataloaders.py:750-883) ----

    @staticmethod
    def _span(anchor, extent, limit, before):
        """1-D placement of an ``extent``-long strip against ``anchor``:
        the strip ends at the anchor (``before``) or starts there. Returns
        (dst_lo, dst_hi, src_lo, src_hi), clipped to [0, limit]."""
        if before:
            lo, hi = max(anchor - extent, 0), anchor
            return lo, hi, extent - (hi - lo), extent
        lo, hi = anchor, min(anchor + extent, limit)
        return lo, hi, 0, hi - lo

    def _tile_labels(self, idx, w, h, dx, dy):
        """This tile's labels shifted into canvas coords (+ its segments)."""
        labels = self.labels[idx].copy()
        if labels.size:
            labels[:, 1:] = self._xywhn2xyxy(labels[:, 1:], w, h, dx, dy)
        segs = [
            s * np.array([w, h], np.float32) + np.array([dx, dy], np.float32)
            for s in self.segments[idx]
            if s is not None
        ]
        return labels, segs

    def _finish_mosaic(self, canvas, labels, segments):
        """Clip, optional copy-paste, and the border-cropping warp shared by
        mosaic4 and mosaic9."""
        np.clip(labels[:, 1:], 0, canvas.shape[0], out=labels[:, 1:])
        for s in segments:
            np.clip(s, 0, canvas.shape[0], out=s)
        canvas, labels, segments = copy_paste(
            canvas, labels, segments, p=self.hyp.get("copy_paste", 0.0), rng=self.rng
        )
        return random_perspective(
            canvas,
            labels,
            segments,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border,
            rng=self.rng,
        )

    @staticmethod
    def _assemble(tiles, canvas_hw):
        """Tile copies into a fresh 114-gray canvas: GIL-free native engine
        when available (the numpy np.full + slice-assign equivalent holds the
        GIL and capped the augmenting loader at ~50 img/s — tools/input_wall.py),
        bit-identical numpy fallback otherwise."""
        from ..native import assemble_tiles_native

        canvas = assemble_tiles_native(tiles, canvas_hw)
        if canvas is not None:
            return canvas
        canvas = np.full((*canvas_hw, 3), 114, dtype=np.uint8)
        for img, (dy, dx, sy, sx, h, w) in tiles:
            # same defensive far-side clip as the native path
            h = min(h, img.shape[0] - sy, canvas_hw[0] - dy)
            w = min(w, img.shape[1] - sx, canvas_hw[1] - dx)
            if h > 0 and w > 0:
                canvas[dy : dy + h, dx : dx + w] = img[sy : sy + h, sx : sx + w]
        return canvas

    def load_mosaic(self, index):
        """4-tile mosaic: tiles meet at a random center point; each quadrant
        shows the tile corner nearest that point."""
        s = self.img_size
        yc, xc = (int(self.rng.uniform(-x, 2 * s + x)) for x in self.mosaic_border)
        indices = [index] + [self.rng.randint(0, self.n - 1) for _ in range(3)]
        self.rng.shuffle(indices)

        tiles = []
        all_labels, all_segs = [], []
        for q, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            x1a, x2a, x1b, x2b = self._span(xc, w, 2 * s, before=q in (0, 2))
            y1a, y2a, y1b, y2b = self._span(yc, h, 2 * s, before=q in (0, 1))
            tiles.append((img, (y1a, x1a, y1b, x1b, y2a - y1a, x2a - x1a)))
            labels, segs = self._tile_labels(idx, w, h, x1a - x1b, y1a - y1b)
            all_labels.append(labels)
            all_segs.extend(segs)
        canvas = self._assemble(tiles, (s * 2, s * 2))

        labels4 = np.concatenate(all_labels, 0) if all_labels else np.zeros((0, 5), np.float32)
        return self._finish_mosaic(canvas, labels4, all_segs)

    # tile origins for the 9-mosaic ring, as (x, y) of each tile's top-left
    # in canvas coords; (w, h) current tile, (w0, h0) center, (wp, hp) previous
    _RING9 = (
        lambda s, w, h, w0, h0, wp, hp: (s, s),  # center
        lambda s, w, h, w0, h0, wp, hp: (s, s - h),  # top
        lambda s, w, h, w0, h0, wp, hp: (s + wp, s - h),  # top right
        lambda s, w, h, w0, h0, wp, hp: (s + w0, s),  # right
        lambda s, w, h, w0, h0, wp, hp: (s + w0, s + hp),  # bottom right
        lambda s, w, h, w0, h0, wp, hp: (s + w0 - w, s + h0),  # bottom
        lambda s, w, h, w0, h0, wp, hp: (s + w0 - wp - w, s + h0),  # bottom left
        lambda s, w, h, w0, h0, wp, hp: (s - w, s + h0 - h),  # left
        lambda s, w, h, w0, h0, wp, hp: (s - w, s + h0 - hp - h),  # top left
    )

    def load_mosaic9(self, index):
        """9-tile mosaic: a center tile with 8 tiles packed clockwise around
        it on a 3s canvas, then a random 2s crop (reference
        utils/dataloaders.py:808-883)."""
        s = self.img_size
        indices = [index] + [self.rng.choice(self.indices) for _ in range(8)]
        self.rng.shuffle(indices)

        tiles = []
        all_labels, all_segs = [], []
        w0 = h0 = wp = hp = -1
        for slot, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if slot == 0:
                w0, h0 = w, h
            ox, oy = self._RING9[slot](s, w, h, w0, h0, wp, hp)
            x1, y1 = max(ox, 0), max(oy, 0)
            x2, y2 = min(ox + w, 3 * s), min(oy + h, 3 * s)
            tiles.append((img, (y1, x1, y1 - oy, x1 - ox, y2 - y1, x2 - x1)))
            labels, segs = self._tile_labels(idx, w, h, ox, oy)
            all_labels.append(labels)
            all_segs.extend(segs)
            wp, hp = w, h

        # random 2s-crop of the 3s canvas, folded into the tile rects so the
        # assembly writes the 2s canvas directly (no 3s intermediate)
        yc, xc = (int(self.rng.uniform(0, s)) for _ in self.mosaic_border)
        cropped = []
        for img, (dy, dx, sy, sx, h, w) in tiles:
            ny, nx = dy - yc, dx - xc
            cy, cx = max(-ny, 0), max(-nx, 0)  # crop eats into the tile
            h, w = h - cy, w - cx
            if h > 0 and w > 0:
                cropped.append((img, (ny + cy, nx + cx, sy + cy, sx + cx, h, w)))
        canvas = self._assemble(cropped, (2 * s, 2 * s))
        labels9 = np.concatenate(all_labels, 0) if all_labels else np.zeros((0, 5), np.float32)
        if labels9.size:
            labels9[:, [1, 3]] -= xc
            labels9[:, [2, 4]] -= yc
        shift = np.array([xc, yc], np.float32)
        all_segs = [seg - shift for seg in all_segs]
        return self._finish_mosaic(canvas, labels9, all_segs)

    # ---- batch fast path (native preproc engine, SURVEY.md §2.9 item 4) ----

    @property
    def batch_fastpath(self) -> bool:
        """Eval batches can be assembled by the native engine in one GIL-free
        pass (augment path and subclasses with extra outputs cannot)."""
        return not self.augment and type(self) is YoloDataset

    def get_eval_batch(self, indices, pool=None):
        """Produce exactly what ``collate([self[i] for i in indices])`` would,
        but via threaded decode + ONE native letterbox pass writing straight
        into the NHWC batch slab (pad + BGR->RGB fused, no GIL). Pre-resized
        sources make the native pass a bit-exact copy (gain == 1). Falls back
        to the per-sample path when the native library is unavailable."""
        from ..native import letterbox_batch_native

        mapper = pool.map if pool is not None else map
        loaded = list(mapper(self.load_image, indices))
        if self.rect:
            shape = tuple(self.batch_shapes[self.batch_index[indices[0]]])
        else:
            shape = (self.img_size, self.img_size)
        out = letterbox_batch_native([im for im, _, _ in loaded], shape, swap_rb=True, scaleup=False)
        if out is None:  # no native library
            return self.collate([self[i] for i in indices])
        batch, geom = out

        b, t = len(indices), self.max_targets
        targets = np.zeros((b, t, 5), np.float32)
        tmask = np.zeros((b, t), bool)
        metas = np.zeros((b, 6), np.float32)
        for k, (idx, (_, (h0, w0), (h, w))) in enumerate(zip(indices, loaded)):
            r, dw, dh = geom[k]
            lb = self.labels[idx].copy()
            if lb.size:
                xy = self._xywhn2xyxy(lb[:, 1:], r * w, r * h, dw, dh)
                lb[:, 1:] = self._xyxy2xywhn(xy, shape[1], shape[0])
            n = min(len(lb), t)
            if n:
                targets[k, :n] = lb[:n]
                tmask[k, :n] = True
            metas[k] = (h0, w0, r * h / h0, r * w / w0, dw, dh)
        if self.return_shapes:
            return batch, targets, tmask, metas
        return batch, targets, tmask

    # ---- fixed-shape collate ----

    def collate(self, samples):
        """list of (img, labels[, meta]) -> images (B,H,W,3) uint8, targets
        (B,T,5), tmask (B,T)[, metas (B,6)] — static shapes for the jit step."""
        imgs = np.stack([s[0] for s in samples])
        b = len(samples)
        t = self.max_targets
        targets = np.zeros((b, t, 5), np.float32)
        tmask = np.zeros((b, t), bool)
        for i, s in enumerate(samples):
            lb = s[1]
            n = min(len(lb), t)
            if n:
                targets[i, :n] = lb[:n]
                tmask[i, :n] = True
        if self.return_shapes:
            metas = np.stack([s[2] for s in samples])
            return imgs, targets, tmask, metas
        return imgs, targets, tmask
