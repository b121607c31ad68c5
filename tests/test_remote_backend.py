"""remote:// dispatch through MultiBackend against the REST server
(reference routes triton:// URLs through DetectMultiBackend the same way,
models/common.py:558-862,:841-854)."""
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from http.server import ThreadingHTTPServer

from leadyolo_tpu.models.backend import MultiBackend
from leadyolo_tpu.serve.restapi import DetectionHandler


class _FakeResults:
    names = {0: "ship"}
    pred = [np.array([[10.0, 20.0, 110.0, 220.0, 0.9, 0.0]], np.float32)]


class _FakeModel:
    def __call__(self, img_rgb):
        assert img_rgb.ndim == 3 and img_rgb.shape[2] == 3
        return _FakeResults()


@pytest.fixture
def rest_server():
    DetectionHandler.models = {"lead-yolo": _FakeModel()}
    server = ThreadingHTTPServer(("127.0.0.1", 0), DetectionHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_remote_backend_roundtrip(rest_server):
    be = MultiBackend(f"remote://{rest_server}/lead-yolo")
    assert be.type == "remote" and be.post_nms
    img = np.full((64, 64, 3), 128, np.uint8)
    out = be.forward(img[None])
    assert out.shape == (1, 1, 6)
    np.testing.assert_allclose(out[0, 0], [10, 20, 110, 220, 0.9, 0.0], atol=1e-3)


def test_http_url_detected_as_remote():
    assert MultiBackend._model_type("http://host:5000/lead-yolo") == "remote"
    assert MultiBackend._model_type("remote://host:5000/m") == "remote"
    assert MultiBackend._model_type("weights/best.ckpt") == "ckpt"
