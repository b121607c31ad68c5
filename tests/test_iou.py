import math

import jax.numpy as jnp
import numpy as np
import pytest

from leadyolo_tpu.ops import iou as I

# -------- independent numpy oracle (standard published definitions) --------


def np_iou_xyxy(a, b, eps=1e-7):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter + eps)


def np_eiou_xyxy(a, b, eps=1e-7):
    """EIoU (Zhang et al. 2021): iou - rho2/c2 - dw2/cw2 - dh2/ch2."""
    iou = np_iou_xyxy(a, b, eps)
    cw = max(a[2], b[2]) - min(a[0], b[0])
    ch = max(a[3], b[3]) - min(a[1], b[1])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b[0] + b[2] - a[0] - a[2]) ** 2 + (b[1] + b[3] - a[1] - a[3]) ** 2) / 4
    dw2 = ((b[2] - b[0]) - (a[2] - a[0])) ** 2
    dh2 = ((b[3] - b[1]) - (a[3] - a[1])) ** 2
    return iou - (rho2 / c2 + dw2 / (cw**2 + eps) + dh2 / (ch**2 + eps))


def np_ciou_xyxy(a, b, eps=1e-7):
    iou = np_iou_xyxy(a, b, eps)
    cw = max(a[2], b[2]) - min(a[0], b[0])
    ch = max(a[3], b[3]) - min(a[1], b[1])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b[0] + b[2] - a[0] - a[2]) ** 2 + (b[1] + b[3] - a[1] - a[3]) ** 2) / 4
    w1, h1 = a[2] - a[0], a[3] - a[1]
    w2, h2 = b[2] - b[0], b[3] - b[1]
    v = (4 / math.pi**2) * (math.atan(w2 / h2) - math.atan(w1 / h1)) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - (rho2 / c2 + v * alpha + eps)


BOX_PAIRS = [
    ([0, 0, 10, 10], [0, 0, 10, 10]),
    ([0, 0, 10, 10], [5, 5, 15, 15]),
    ([0, 0, 10, 10], [20, 20, 30, 30]),
    ([2, 3, 8, 9], [4, 1, 12, 7]),
    ([0, 0, 4, 16], [1, 2, 5, 10]),
]


@pytest.mark.parametrize("a,b", BOX_PAIRS)
def test_iou_matches_oracle(a, b):
    got = float(I.bbox_iou(jnp.array(a, jnp.float32), jnp.array(b, jnp.float32), xywh=False, kind="iou"))
    np.testing.assert_allclose(got, np_iou_xyxy(a, b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("a,b", BOX_PAIRS)
def test_eiou_matches_oracle(a, b):
    got = float(I.bbox_iou(jnp.array(a, jnp.float32), jnp.array(b, jnp.float32), xywh=False, kind="eiou"))
    np.testing.assert_allclose(got, np_eiou_xyxy(a, b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("a,b", BOX_PAIRS)
def test_ciou_matches_oracle(a, b):
    got = float(I.bbox_iou(jnp.array(a, jnp.float32), jnp.array(b, jnp.float32), xywh=False, kind="ciou"))
    np.testing.assert_allclose(got, np_ciou_xyxy(a, b), rtol=1e-4, atol=1e-5)


def test_identical_boxes_all_kinds():
    a = jnp.array([2.0, 3.0, 8.0, 9.0])
    for kind in ("iou", "giou", "diou", "ciou", "eiou", "siou", "mpdiou"):
        v = I.bbox_iou(a, a, xywh=False, kind=kind)
        np.testing.assert_allclose(float(v), 1.0, atol=1e-4), kind


def test_xywh_equals_xyxy_path():
    a_xyxy = jnp.array([0.0, 0.0, 10.0, 10.0])
    b_xyxy = jnp.array([5.0, 5.0, 15.0, 15.0])
    a_xywh = jnp.array([5.0, 5.0, 10.0, 10.0])
    b_xywh = jnp.array([10.0, 10.0, 10.0, 10.0])
    for kind in ("iou", "eiou", "ciou", "siou"):
        v1 = float(I.bbox_iou(a_xyxy, b_xyxy, xywh=False, kind=kind))
        v2 = float(I.bbox_iou(a_xywh, b_xywh, xywh=True, kind=kind))
        np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)


def test_focal_returns_weight():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 15.0, 15.0])
    val, w = I.bbox_iou(a, b, xywh=False, kind="eiou", focal=True, gamma=0.5)
    iou = np_iou_xyxy([0, 0, 10, 10], [5, 5, 15, 15])
    np.testing.assert_allclose(float(w), iou**0.5, rtol=1e-5)
    np.testing.assert_allclose(float(val), np_eiou_xyxy([0, 0, 10, 10], [5, 5, 15, 15]), rtol=1e-4)


def test_wiou_pieces():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 15.0, 15.0])
    iou, dist = I.bbox_iou(a, b, xywh=False, kind="wiou")
    assert float(iou) == pytest.approx(np_iou_xyxy([0, 0, 10, 10], [5, 5, 15, 15]), rel=1e-5)
    assert float(dist) > 1.0  # exp(rho2/c2) with nonzero center distance


def test_box_iou_matrix(rng):
    b1 = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    b2 = np.array([[0, 0, 10, 10], [100, 100, 110, 110], [5, 0, 15, 10]], np.float32)
    m = np.asarray(I.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    expect = np.array(
        [[np_iou_xyxy(a, b) for b in b2] for a in b1], np.float32
    )
    np.testing.assert_allclose(m, expect, rtol=1e-5, atol=1e-6)


def test_wh_iou():
    m = np.asarray(I.wh_iou(jnp.array([[4.0, 4.0]]), jnp.array([[4.0, 4.0], [2.0, 2.0], [8.0, 2.0]])))
    np.testing.assert_allclose(m, [[1.0, 4 / 16, 8 / (16 + 16 - 8)]], rtol=1e-5)


def test_bbox_ioa():
    out = np.asarray(I.bbox_ioa(jnp.array([0.0, 0.0, 10.0, 10.0]), jnp.array([[5.0, 5.0, 15.0, 15.0]])))
    np.testing.assert_allclose(out, [25.0 / 100.0], rtol=1e-5)


def test_wiou_scale_state():
    mean0 = jnp.array(1.0)
    loss_val = jnp.array([0.4, 0.6])
    m1 = I.wiou_scale_update(mean0, loss_val)
    assert 0.99 < float(m1) < 1.0  # tiny momentum pulls toward 0.5
    r = I.wiou_scale(loss_val, m1, monotonous=False)
    assert r.shape == (2,)
    r2 = I.wiou_scale(loss_val, m1, monotonous=True)
    np.testing.assert_allclose(np.asarray(r2), np.sqrt(np.asarray(loss_val) / float(m1)), rtol=1e-5)
