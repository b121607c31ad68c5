"""REST object-detection server.

Capability parity with reference utils/flask_rest_api/restapi.py:16-48
(multi-model ``POST /v1/object-detection/<model>`` returning record-style
JSON), implemented on the stdlib http.server (flask is not baked into this
image; the wire contract is identical).

    python -m leadyolo_tpu.serve.restapi --weights best.ckpt --port 5000
    curl -X POST -F image=@ship.jpg http://localhost:5000/v1/object-detection/lead-yolo
"""
from __future__ import annotations

import argparse
import io
import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class DetectionHandler(BaseHTTPRequestHandler):
    models = {}  # name -> AutoShape

    def do_POST(self):
        m = re.match(r"^/v1/object-detection/([\w\-.]+)$", self.path)
        if not m or m.group(1) not in self.models:
            self.send_error(404, f"unknown model; available: {list(self.models)}")
            return
        model = self.models[m.group(1)]
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        img_bytes = self._extract_image(body)
        if img_bytes is None:
            self.send_error(400, "no image payload (send multipart field 'image' or raw bytes)")
            return

        import cv2

        arr = cv2.imdecode(np.frombuffer(img_bytes, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            self.send_error(400, "could not decode image")
            return
        results = model(arr[:, :, ::-1])  # BGR -> RGB
        det = results.pred[0]
        records = [
            {
                "xmin": float(x1),
                "ymin": float(y1),
                "xmax": float(x2),
                "ymax": float(y2),
                "confidence": float(conf),
                "class": int(cls),
                "name": results.names.get(int(cls), str(int(cls))),
            }
            for x1, y1, x2, y2, conf, cls in det
        ]
        payload = json.dumps(records).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _extract_image(self, body: bytes):
        ctype = self.headers.get("Content-Type", "")
        if ctype.startswith("multipart/form-data"):
            m = re.search(r'boundary="?([^";]+)"?', ctype)
            if not m:
                return None
            boundary = b"--" + m.group(1).encode()
            for part in body.split(boundary):
                if b"\r\n\r\n" in part and (b'name="image"' in part or b"filename=" in part):
                    return part.split(b"\r\n\r\n", 1)[1].rstrip(b"\r\n-")
            return None
        return body or None

    def log_message(self, fmt, *args):
        pass  # quiet


def serve(models: dict, host: str = "0.0.0.0", port: int = 5000):
    DetectionHandler.models = models
    server = ThreadingHTTPServer((host, port), DetectionHandler)
    print(f"serving {list(models)} on http://{host}:{port}/v1/object-detection/<model>")
    server.serve_forever()


def main():
    import hubconf

    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--cfg", default="lead-yolo")
    p.add_argument("--name", default=None, help="model name in the URL (default: cfg)")
    p.add_argument("--port", type=int, default=5000)
    a = p.parse_args()
    model = hubconf.load(a.cfg, a.weights)
    serve({a.name or a.cfg: model}, port=a.port)


if __name__ == "__main__":
    main()
