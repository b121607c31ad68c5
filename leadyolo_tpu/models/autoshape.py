"""AutoShape + Detections: the input-robust "library" inference API.

Capability parity with reference models/common.py:867-1127: accepts
file paths, URLs, PIL images, numpy arrays or jax arrays (single or list),
letterboxes a batch, runs the jitted forward+NMS, scales boxes back to each
native image space, and returns a Detections object with pandas views,
print/save/crop/render helpers.
"""
from __future__ import annotations

import io
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression


def _load_any(im):
    """Anything -> (HWC BGR uint8, name). Reference models/common.py:944-965."""
    name = "image"
    if isinstance(im, (str, Path)):
        p = str(im)
        if p.startswith("http"):
            import urllib.request

            data = urllib.request.urlopen(p).read()
            arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        else:
            arr = cv2.imread(p)
            name = Path(p).stem
        assert arr is not None, f"could not read {im}"
        return arr, name
    try:
        from PIL import Image

        if isinstance(im, Image.Image):
            return np.asarray(im.convert("RGB"))[:, :, ::-1].copy(), getattr(im, "filename", "image") or "image"
    except ImportError:
        pass
    arr = np.asarray(im)
    if arr.ndim == 2:
        arr = cv2.cvtColor(arr, cv2.COLOR_GRAY2BGR)
    if arr.dtype != np.uint8:
        arr = (arr * 255).clip(0, 255).astype(np.uint8)
    return arr[:, :, ::-1].copy() if arr.shape[2] == 3 else arr, name  # assume RGB in


class AutoShape:
    """Wraps a DetectionModel + variables into a call-anything API."""

    conf = 0.25
    iou = 0.45
    agnostic = False
    multi_label = False
    classes = None
    max_det = 1000

    def __init__(self, model, variables, names=None, size: int = 640):
        self.model = model
        self.variables = variables
        self.size = size
        self.names = names or {i: str(i) for i in range(model.nc)}
        self._infer = jax.jit(self._infer_fn, static_argnames=("conf", "iou", "multi_label", "agnostic", "max_det"))

    def _infer_fn(self, variables, x, conf, iou, multi_label, agnostic, max_det):
        preds = self.model.apply(variables, x.astype(jnp.bfloat16) / 255.0, train=False, decode=True)
        if isinstance(preds, tuple):
            preds = preds[0]
        return non_max_suppression(
            preds.astype(jnp.float32),
            conf_thres=conf,
            iou_thres=iou,
            multi_label=multi_label,
            agnostic=agnostic,
            max_det=max_det,
            max_nms=4096,
            nc=self.model.nc,
        )

    def __call__(self, ims, size=None):
        size = size or self.size
        single = not isinstance(ims, (list, tuple))
        if single:
            ims = [ims]
        loaded = [_load_any(im) for im in ims]
        shapes0 = [im.shape[:2] for im, _ in loaded]
        batch = np.stack(
            [letterbox(im, size, auto=False)[0][:, :, ::-1] for im, _ in loaded]
        ).copy()  # BGR->RGB
        det, valid, _ = self._infer(
            self.variables,
            jnp.asarray(batch),
            conf=self.conf,
            iou=self.iou,
            multi_label=self.multi_label,
            agnostic=self.agnostic,
            max_det=self.max_det,
        )
        det, valid = np.asarray(det), np.asarray(valid)
        preds = []
        for i, (h0, w0) in enumerate(shapes0):
            d = det[i][valid[i]].copy()
            if len(d):
                d[:, :4] = np.asarray(scale_boxes((size, size), jnp.asarray(d[:, :4]), (h0, w0)))
            preds.append(d)
        return Detections([im for im, _ in loaded], preds, [n for _, n in loaded], self.names)


class Detections:
    """Results container (reference models/common.py:1012-1127)."""

    def __init__(self, ims, preds, files, names):
        self.ims = ims  # BGR uint8
        self.pred = preds  # list of (n,6) xyxy conf cls
        self.files = files
        self.names = names
        self.n = len(ims)

    @property
    def xyxy(self):
        return self.pred

    @property
    def xywh(self):
        out = []
        for d in self.pred:
            x = d.copy()
            if len(x):
                x[:, 0] = (d[:, 0] + d[:, 2]) / 2
                x[:, 1] = (d[:, 1] + d[:, 3]) / 2
                x[:, 2] = d[:, 2] - d[:, 0]
                x[:, 3] = d[:, 3] - d[:, 1]
            out.append(x)
        return out

    def pandas(self):
        import pandas as pd

        cols = ["xmin", "ymin", "xmax", "ymax", "confidence", "class"]
        frames = []
        for d in self.pred:
            df = pd.DataFrame(d, columns=cols)
            df["name"] = [self.names.get(int(c), int(c)) for c in df["class"]]
            frames.append(df)

        class _View:
            xyxy = frames

        return _View()

    def __len__(self):
        return self.n

    def print(self):
        for i, d in enumerate(self.pred):
            counts = {}
            for c in d[:, 5].astype(int) if len(d) else []:
                counts[c] = counts.get(c, 0) + 1
            desc = ", ".join(f"{v} {self.names.get(k, k)}" for k, v in counts.items()) or "(no detections)"
            print(f"image {i + 1}/{self.n} {self.files[i]}: {desc}")

    def render(self):
        from ..cli.detect import annotate

        return [annotate(im.copy(), d, self.names) for im, d in zip(self.ims, self.pred)]

    def save(self, save_dir="runs/hub"):
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for im, f in zip(self.render(), self.files):
            cv2.imwrite(str(save_dir / f"{f}.jpg"), im)

    def crop(self, save_dir="runs/hub/crops"):
        save_dir = Path(save_dir)
        out = []
        for im, d, f in zip(self.ims, self.pred, self.files):
            for j, (*xyxy, conf, cls) in enumerate(d):
                x1, y1, x2, y2 = (int(v) for v in xyxy)
                crop = im[max(y1, 0) : y2, max(x1, 0) : x2]
                out.append({"box": xyxy, "conf": conf, "cls": cls, "im": crop})
                cdir = save_dir / self.names.get(int(cls), str(int(cls)))
                cdir.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(cdir / f"{f}_{j}.jpg"), crop)
        return out
