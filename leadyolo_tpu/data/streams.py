"""Streaming input sources: video files, webcams, RTSP streams, screenshots.

Capability parity with reference utils/dataloaders.py:190-425 (LoadImages /
LoadStreams / LoadScreenshots): LoadStreams runs one daemon reader thread per
source so inference always sees the freshest frame; LoadScreenshots degrades
gracefully when mss is absent (it is not baked into this image).
"""
from __future__ import annotations

import math
import threading
import time
from pathlib import Path

import cv2
import numpy as np

from .augment import letterbox

IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")
VID_EXTS = (".avi", ".mkv", ".mov", ".mp4", ".mpeg", ".mpg", ".wmv")


class LoadImages:
    """Files / dirs / globs of images and videos (reference :239-339)."""

    def __init__(self, path, img_size=640, stride=32, auto=False, vid_stride=1):
        p = Path(path)
        if p.is_dir():
            files = sorted(str(x) for x in p.rglob("*.*"))
        elif p.is_file():
            files = [str(p)]
        else:
            import glob

            files = sorted(glob.glob(str(p), recursive=True))
        self.images = [f for f in files if Path(f).suffix.lower() in IMG_EXTS]
        self.videos = [f for f in files if Path(f).suffix.lower() in VID_EXTS]
        self.img_size, self.stride, self.auto, self.vid_stride = img_size, stride, auto, vid_stride

    def __iter__(self):
        for f in self.images:
            im0 = cv2.imread(f)
            if im0 is None:
                continue
            yield f, self._prep(im0), im0, None
        for f in self.videos:
            cap = cv2.VideoCapture(f)
            n = 0
            while True:
                ok, im0 = cap.read()
                if not ok:
                    break
                if n % self.vid_stride == 0:
                    yield f, self._prep(im0), im0, cap
                n += 1
            cap.release()

    def _prep(self, im0):
        im = letterbox(im0, self.img_size, stride=self.stride, auto=self.auto)[0]
        return np.ascontiguousarray(im[:, :, ::-1])  # RGB HWC


class LoadStreams:
    """Webcam indices / RTSP / HTTP streams with per-source reader threads
    (reference :342-425)."""

    def __init__(self, sources, img_size=640, stride=32, auto=False, vid_stride=1):
        if isinstance(sources, str):
            sources = [sources]
        self.sources = sources
        self.img_size, self.stride, self.auto, self.vid_stride = img_size, stride, auto, vid_stride
        self.frames = [None] * len(sources)
        self.caps = []
        self.running = True
        self.threads = []
        for i, s in enumerate(sources):
            src = int(s) if str(s).isnumeric() else s
            cap = cv2.VideoCapture(src)
            assert cap.isOpened(), f"failed to open stream {s}"
            ok, self.frames[i] = cap.read()
            assert ok, f"failed to read from stream {s}"
            self.caps.append(cap)
            t = threading.Thread(target=self._reader, args=(i, cap), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i, cap):
        n = 0
        while self.running and cap.isOpened():
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, im = cap.retrieve()
                if ok:
                    self.frames[i] = im
                else:
                    time.sleep(0.01)

    def __iter__(self):
        while self.running:
            im0s = [f.copy() for f in self.frames]
            ims = np.stack(
                [
                    np.ascontiguousarray(
                        letterbox(im0, self.img_size, stride=self.stride, auto=self.auto)[0][:, :, ::-1]
                    )
                    for im0 in im0s
                ]
            )
            yield self.sources, ims, im0s, None

    def close(self):
        self.running = False
        for cap in self.caps:
            cap.release()


class LoadScreenshots:
    """Screen-region capture via mss (reference :190-236); raises a clear
    error when mss is unavailable."""

    def __init__(self, source="screen 0", img_size=640, stride=32, auto=False):
        try:
            import mss
        except ImportError as e:
            raise ImportError("screenshot source requires the 'mss' package (not in this image)") from e
        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.sct = mss.mss()
        self.monitor = self.sct.monitors[self.screen + 1]
        self.img_size, self.stride, self.auto = img_size, stride, auto

    def __iter__(self):
        while True:
            im0 = np.asarray(self.sct.grab(self.monitor))[:, :, :3]
            im = letterbox(im0, self.img_size, stride=self.stride, auto=self.auto)[0]
            yield f"screen{self.screen}", np.ascontiguousarray(im[:, :, ::-1]), im0, None
