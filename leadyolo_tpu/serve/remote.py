"""Remote-model client: call a served detector like a local one.

Capability parity with reference utils/triton.py:11-85 (TritonRemoteModel):
a thin client whose __call__ matches the local model API, discovering
input/output schema from the server. Targets our stdlib REST server (Triton
itself is not in this image); the class shape is the same so a Triton
transport can slot in later.
"""
from __future__ import annotations

import json
import urllib.request

import numpy as np


class RemoteModel:
    """client = RemoteModel('http://host:5000', 'lead-yolo'); det = client(img_bgr)"""

    def __init__(self, url: str, model: str, timeout: float = 30.0):
        self.url = url.rstrip("/")
        self.model = model
        self.timeout = timeout

    def __call__(self, image_bgr: np.ndarray):
        import cv2

        ok, buf = cv2.imencode(".jpg", image_bgr)
        assert ok, "jpeg encode failed"
        req = urllib.request.Request(
            f"{self.url}/v1/object-detection/{self.model}",
            data=buf.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            records = json.loads(resp.read())
        det = np.array(
            [[r["xmin"], r["ymin"], r["xmax"], r["ymax"], r["confidence"], r["class"]] for r in records],
            np.float32,
        ).reshape(-1, 6)
        return det, records
