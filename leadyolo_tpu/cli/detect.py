"""Streaming/file inference CLI (reference detect.py:53-270 equivalent).

Sources: image file, directory, glob, or video file. Per-frame pipeline:
letterbox -> jitted forward+decode+NMS -> scale boxes to native space ->
annotate/save/print, with txt/conf/crop options.
"""
from __future__ import annotations

import argparse
import glob as globlib
import time
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..models.yolo import DetectionModel
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from ..utils.checkpoint import load_checkpoint

IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")
VID_EXTS = (".avi", ".mkv", ".mov", ".mp4", ".mpeg", ".mpg", ".wmv")

COLORS = [(56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207), (10, 249, 72)]


def annotate(im, det, names):
    for *xyxy, conf, cls in det:
        c = int(cls)
        p1, p2 = (int(xyxy[0]), int(xyxy[1])), (int(xyxy[2]), int(xyxy[3]))
        color = COLORS[c % len(COLORS)]
        cv2.rectangle(im, p1, p2, color, 2, lineType=cv2.LINE_AA)
        label = f"{names.get(c, c)} {conf:.2f}"
        tw, th = cv2.getTextSize(label, 0, 0.5, 1)[0]
        cv2.rectangle(im, p1, (p1[0] + tw, p1[1] - th - 4), color, -1, cv2.LINE_AA)
        cv2.putText(im, label, (p1[0], p1[1] - 2), 0, 0.5, (255, 255, 255), 1, cv2.LINE_AA)
    return im


def iter_source(source, vid_stride=1):
    """Yield (path, frame_bgr, is_video)."""
    p = Path(source)
    if p.is_dir():
        files = sorted(x for x in p.rglob("*.*") if x.suffix.lower() in IMG_EXTS + VID_EXTS)
    elif any(ch in str(source) for ch in "*?["):
        files = [Path(x) for x in sorted(globlib.glob(str(source), recursive=True))]
    else:
        files = [p]
    for f in files:
        if f.suffix.lower() in VID_EXTS:
            cap = cv2.VideoCapture(str(f))
            n = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if n % vid_stride == 0:
                    yield f, frame, True
                n += 1
            cap.release()
        else:
            im = cv2.imread(str(f))
            if im is not None:
                yield f, im, False


def run(
    weights: str,
    source: str,
    cfg: str = "lead-yolo",
    imgsz: int = 640,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    save_dir: str = "runs/detect/exp",
    save_txt: bool = False,
    save_conf: bool = False,
    save_crop: bool = False,
    nosave: bool = False,
    classes=None,
    agnostic_nms: bool = False,
    augment: bool = False,
    vid_stride: int = 1,
    names: dict | None = None,
    log_fn=print,
    fused: bool = False,
):
    if fused:
        from ..utils import set_fused_kernels

        set_fused_kernels(True)
    save_dir = Path(save_dir)
    (save_dir / "labels" if save_txt else save_dir).mkdir(parents=True, exist_ok=True)

    ckpt, meta = load_checkpoint(weights)
    variables = ckpt.get("ema", {}).get("variables", ckpt) if isinstance(ckpt, dict) and "ema" in ckpt else ckpt
    nc = meta.get("nc")
    model = DetectionModel(meta.get("cfg", cfg), nc=nc)
    names = names or {i: str(i) for i in range(model.nc)}

    @jax.jit
    def infer(variables, im):
        x = im.astype(jnp.bfloat16) / 255.0
        if augment:  # TTA: scale+flip ensemble (reference detect.py:57 --augment)
            preds = model.apply_augmented(variables, x)
        else:
            preds = model.apply(variables, x, train=False, decode=True)
        if isinstance(preds, tuple):
            preds = preds[0]
        return non_max_suppression(
            preds.astype(jnp.float32),
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            classes=classes,
            agnostic=agnostic_nms,
            max_det=max_det,
            max_nms=1024,
            nc=model.nc,
        )

    results = []
    for path, im0, is_video in iter_source(source, vid_stride):
        t0 = time.perf_counter()
        im, _, _ = letterbox(im0, imgsz, auto=False)
        x = jnp.asarray(im[None, :, :, ::-1].copy())  # BGR->RGB NHWC
        det, valid, _ = infer(variables, x)
        det = np.asarray(det[0])[np.asarray(valid[0])]
        if len(det):
            det[:, :4] = np.asarray(scale_boxes((imgsz, imgsz), jnp.asarray(det[:, :4]), im0.shape[:2]))
        dt = (time.perf_counter() - t0) * 1000
        log_fn(f"{path}: {im0.shape[1]}x{im0.shape[0]} {len(det)} detections ({dt:.1f}ms)")
        results.append((str(path), det))

        if save_txt and len(det):
            gn = np.array([im0.shape[1], im0.shape[0], im0.shape[1], im0.shape[0]])
            with open(save_dir / "labels" / (Path(path).stem + ".txt"), "a") as f:
                for *xyxy, conf, cls in det:
                    x1, y1, x2, y2 = xyxy
                    xywh = [(x1 + x2) / 2 / gn[0], (y1 + y2) / 2 / gn[1], (x2 - x1) / gn[0], (y2 - y1) / gn[1]]
                    line = (int(cls), *xywh, conf) if save_conf else (int(cls), *xywh)
                    f.write(("%g " * len(line)).rstrip() % line + "\n")
        if save_crop and len(det):
            for j, (*xyxy, conf, cls) in enumerate(det):
                x1, y1, x2, y2 = (int(v) for v in xyxy)
                crop = im0[max(y1, 0) : y2, max(x1, 0) : x2]
                if crop.size:
                    cdir = save_dir / "crops" / names.get(int(cls), str(int(cls)))
                    cdir.mkdir(parents=True, exist_ok=True)
                    cv2.imwrite(str(cdir / f"{Path(path).stem}_{j}.jpg"), crop)
        if not nosave:
            out = annotate(im0.copy(), det, names)
            cv2.imwrite(str(save_dir / (Path(path).stem + ".jpg")), out)
    return results


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--cfg", type=str, default="lead-yolo")
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--save-dir", "--project", type=str, default="runs/detect/exp")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-crop", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--classes", nargs="+", type=int)
    p.add_argument("--agnostic-nms", action="store_true")
    p.add_argument("--augment", action="store_true", help="TTA scale+flip ensemble")
    p.add_argument("--vid-stride", type=int, default=1)
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas inference kernels (TPU; mAP-invariant, slow first compile)")
    return p.parse_args()


def main():
    run(**vars(parse_opt()))


if __name__ == "__main__":
    main()
