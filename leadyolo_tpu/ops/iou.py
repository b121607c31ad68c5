"""IoU family: IoU / GIoU / DIoU / CIoU / EIoU / SIoU / WIoU / MPDIoU, with
alpha-IoU powers and Focal-IoU weights.

Capability parity with the reference's extended ``bbox_iou``
(reference: utils/metrics.py:293-402) and the WIoU scale state machine
(reference: utils/metrics.py:261-290), re-expressed functionally: broadcasting
elementwise ops over trailing-dim-4 arrays; the WIoU running mean is explicit
state threaded by the caller (no hidden class attribute), which is what a
jit-compiled TPU train step needs.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

IOU_KINDS = ("iou", "giou", "diou", "ciou", "eiou", "siou", "wiou", "mpdiou")


def _corners(box, xywh, eps):
    if xywh:
        cx, cy, w, h = jnp.split(box, 4, axis=-1)
        hw, hh = w / 2, h / 2
        x1, x2, y1, y2 = cx - hw, cx + hw, cy - hh, cy + hh
    else:
        x1, y1, x2, y2 = jnp.split(box, 4, axis=-1)
        w, h = x2 - x1, jnp.clip(y2 - y1, eps, None)
    return x1, y1, x2, y2, w, h


def bbox_iou(
    box1,
    box2,
    xywh: bool = True,
    kind: str = "iou",
    focal: bool = False,
    alpha: float = 1.0,
    gamma: float = 0.5,
    eps: float = 1e-7,
):
    """Elementwise (broadcasting) IoU between box1 and box2, trailing dim 4.

    Returns an array shaped like the broadcast of the inputs minus the last
    dim (squeezed), or a tuple when ``focal`` or ``kind='wiou'``:

    - ``focal=True``      -> (value, focal_weight) with focal_weight = iou**gamma
    - ``kind='wiou'``     -> (iou, exp(rho2/c2))  [WIoU v1 pieces; see wiou_loss]

    Semantics mirror reference utils/metrics.py:293-402 (incl. alpha-IoU powers
    and the EIoU decomposition used by the shipped loss at utils/loss.py:142).
    """
    assert kind in IOU_KINDS, f"unknown IoU kind {kind!r}"
    b1_x1, b1_y1, b1_x2, b1_y2, w1, h1 = _corners(box1, xywh, eps)
    b2_x1, b2_y1, b2_x2, b2_y2, w2, h2 = _corners(box2, xywh, eps)

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = (inter / (union + eps)) ** alpha

    def _sq(x):
        return x.squeeze(-1)

    focal_w = (inter / (union + eps)) ** gamma

    if kind == "iou":
        out = iou
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height

    if kind == "giou":
        c_area = cw * ch + eps
        out = iou - ((c_area - union) / c_area + eps) ** alpha
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    c2 = (cw**2 + ch**2) ** alpha + eps  # convex diagonal squared
    rho2 = (((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4) ** alpha

    if kind == "diou":
        out = iou - rho2 / c2
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    if kind == "ciou":
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha_ciou = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        out = iou - (rho2 / c2 + (v * alpha_ciou + eps) ** alpha)
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    if kind == "eiou":
        rho_w2 = ((b2_x2 - b2_x1) - (b1_x2 - b1_x1)) ** 2
        rho_h2 = ((b2_y2 - b2_y1) - (b1_y2 - b1_y1)) ** 2
        cw2 = (cw**2 + eps) ** alpha
        ch2 = (ch**2 + eps) ** alpha
        out = iou - (rho2 / c2 + rho_w2 / cw2 + rho_h2 / ch2)
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    if kind == "siou":
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5 + eps
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5 + eps
        sigma = (s_cw**2 + s_ch**2) ** 0.5
        sin_a1 = jnp.abs(s_cw) / sigma
        sin_a2 = jnp.abs(s_ch) / sigma
        threshold = 2**0.5 / 2
        sin_a = jnp.where(sin_a1 > threshold, sin_a2, sin_a1)
        angle_cost = jnp.cos(jnp.arcsin(jnp.clip(sin_a, -1, 1)) * 2 - math.pi / 2)
        rho_x = (s_cw / cw) ** 2
        rho_y = (s_ch / ch) ** 2
        g = angle_cost - 2
        distance_cost = 2 - jnp.exp(g * rho_x) - jnp.exp(g * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        out = iou - (0.5 * (distance_cost + shape_cost) + eps) ** alpha
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    if kind == "mpdiou":
        cw2 = (cw**2 + eps) ** alpha
        ch2 = (ch**2 + eps) ** alpha
        d12 = ((b2_x1 - b1_x1) - (b2_y1 - b1_y1)) ** 2
        d22 = ((b2_x2 - b1_x2) - (b2_y2 - b1_y2)) ** 2
        out = iou - (d12 + d22) / (cw2 + ch2)
        return (_sq(out), _sq(focal_w)) if focal else _sq(out)

    # wiou: return the raw pieces; combine via wiou_loss (state threaded by caller)
    return _sq(iou), _sq(jnp.exp(rho2 / c2))


# --- WIoU scale (functional version of reference utils/metrics.py:261-290) ---

WIOU_MOMENTUM = 1 - 0.5 ** (1 / 7000)


def wiou_scale_update(iou_mean, iou_loss_val):
    """EMA update of the WIoU running mean (reference WIoU_Scale._update)."""
    return (1 - WIOU_MOMENTUM) * iou_mean + WIOU_MOMENTUM * jnp.mean(jax.lax.stop_gradient(iou_loss_val))


def wiou_scale(iou_loss_val, iou_mean, monotonous=False, gamma=1.9, delta=3.0):
    """Non-monotonic (v3) / monotonic (v2) focusing coefficient
    (reference WIoU_Scale._scaled_loss)."""
    beta = jax.lax.stop_gradient(iou_loss_val) / iou_mean
    if monotonous:
        return jnp.sqrt(beta)
    return beta / (delta * gamma ** (beta - delta))


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU matrix between two xyxy box sets: (N,4),(M,4)->(N,M).

    Reference: utils/metrics.py:406-425.
    """
    a1, a2 = jnp.split(box1[:, None, :], 2, axis=-1)  # (N,1,2),(N,1,2)
    b1, b2 = jnp.split(box2[None, :, :], 2, axis=-1)  # (1,M,2),(1,M,2)
    inter = jnp.prod(jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None), axis=-1)
    area1 = jnp.prod(a2 - a1, axis=-1)
    area2 = jnp.prod(b2 - b1, axis=-1)
    return inter / (area1 + area2 - inter + eps)


def wh_iou(wh1, wh2, eps: float = 1e-7):
    """IoU of aligned (centered) boxes given only w,h: (N,2),(M,2)->(N,M).

    Reference: utils/metrics.py:449-454.
    """
    wh1 = wh1[:, None]
    wh2 = wh2[None]
    inter = jnp.prod(jnp.minimum(wh1, wh2), axis=2)
    return inter / (jnp.prod(wh1, axis=2) + jnp.prod(wh2, axis=2) - inter + eps)


def bbox_ioa(box1, box2, eps: float = 1e-7):
    """Intersection over box2 area; box1 (4,), box2 (N,4) xyxy.

    Reference: utils/metrics.py:428-446. Used by copy-paste / cutout augment.
    """
    b1_x1, b1_y1, b1_x2, b1_y2 = box1
    b2_x1, b2_y1, b2_x2, b2_y2 = box2.T
    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    area2 = (b2_x2 - b2_x1) * (b2_y2 - b2_y1) + eps
    return inter / area2
