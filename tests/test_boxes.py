import jax.numpy as jnp
import numpy as np

from leadyolo_tpu.ops import boxes as B


def test_xywh_xyxy_roundtrip(rng):
    x = rng.uniform(10, 100, size=(32, 4)).astype(np.float32)
    out = np.asarray(B.xyxy2xywh(B.xywh2xyxy(jnp.asarray(x))))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


def test_xywh2xyxy_known():
    out = np.asarray(B.xywh2xyxy(jnp.array([[10.0, 20.0, 4.0, 6.0]])))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_xywhn2xyxy_pad():
    # normalized center box on a 100x200 (h,w) image with 5px pad
    out = np.asarray(B.xywhn2xyxy(jnp.array([[0.5, 0.5, 0.2, 0.4]]), w=200, h=100, padw=5, padh=7))
    np.testing.assert_allclose(out, [[5 + 80, 7 + 30, 5 + 120, 7 + 70]])


def test_xyxy2xywhn_roundtrip(rng):
    x = rng.uniform(0.2, 0.4, size=(8, 4)).astype(np.float32)
    x[:, 2:] += 0.5  # ensure x2>x1, y2>y1 (in normalized pixel terms)
    px = np.asarray(B.xywhn2xyxy(jnp.asarray(B.xyxy2xywhn(jnp.asarray(x * 640), w=640, h=640)), w=640, h=640))
    np.testing.assert_allclose(px, x * 640, rtol=1e-4, atol=1e-3)


def test_clip_boxes():
    out = np.asarray(B.clip_boxes(jnp.array([[-5.0, -5.0, 700.0, 300.0]]), (256, 640)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 256.0]])


def test_scale_boxes_inverts_letterbox():
    # original image 480x640 (h,w) letterboxed into 640x640: gain=1.0? no:
    # gain = min(640/480, 640/640) = 1.0 -> pad = (0, 80)
    img0, img1 = (480, 640), (640, 640)
    gain = min(img1[0] / img0[0], img1[1] / img0[1])
    padw = (img1[1] - img0[1] * gain) / 2
    padh = (img1[0] - img0[0] * gain) / 2
    orig = np.array([[100.0, 50.0, 200.0, 150.0]], np.float32)
    lb = orig * gain + np.array([padw, padh, padw, padh], np.float32)
    back = np.asarray(B.scale_boxes(img1, jnp.asarray(lb), img0))
    np.testing.assert_allclose(back, orig, rtol=1e-5, atol=1e-4)


def test_box_area():
    a = np.asarray(B.box_area(jnp.array([[0.0, 0.0, 4.0, 5.0], [1.0, 1.0, 3.0, 2.0]])))
    np.testing.assert_allclose(a, [20.0, 2.0])
