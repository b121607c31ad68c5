"""Box coordinate transforms (pure jnp, shape-polymorphic, jit-safe).

Capability parity with the reference's box helpers (reference:
utils/general.py:750-880), re-expressed as pure JAX functions over
``(..., 4)`` arrays so they vmap/jit freely on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Reference: utils/general.py:765."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Reference: utils/general.py:755."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2) with optional pad offset.

    Reference: utils/general.py:775.
    """
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    """Pixel (x1, y1, x2, y2) -> normalized (cx, cy, w, h). Reference: utils/general.py:785."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [((x1 + x2) / 2) / w, ((y1 + y2) / 2) / h, (x2 - x1) / w, (y2 - y1) / h],
        axis=-1,
    )


def xyn2xy(x, w=640, h=640, padw=0, padh=0):
    """Normalized segment points -> pixel points. Reference: utils/general.py:796."""
    px, py = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([w * px + padw, h * py + padh], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w). Reference: utils/general.py:860."""
    h, w = shape[0], shape[1]
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x1, 0, w),
            jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w),
            jnp.clip(y2, 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Rescale xyxy boxes from a letterboxed shape back to the original image.

    ``img1_shape``/``img0_shape`` are (h, w). Mirrors the reference's
    inverse-letterbox (reference: utils/general.py:824-840): gain is
    min(h1/h0, w1/w0), pad is the centered slack.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]

    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    boxes = jnp.concatenate(
        [(x1 - pad[0]) / gain, (y1 - pad[1]) / gain, (x2 - pad[0]) / gain, (y2 - pad[1]) / gain],
        axis=-1,
    )
    return clip_boxes(boxes, img0_shape)


def box_area(boxes):
    """Area of xyxy boxes, shape (..., 4) -> (...)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return ((x2 - x1) * (y2 - y1)).squeeze(-1)
