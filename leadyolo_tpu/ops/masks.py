"""Instance-mask ops: crop, prototype assembly, polygon rasterization, mask IoU.

Capability parity with reference utils/segment/general.py (crop_mask,
process_mask / process_mask_upsample / process_mask_native, masks2segments,
scale_image) and the polygon helpers in utils/segment/dataloaders.py
(polygons2masks, polygons2masks_overlap). Device math is jnp; polygon
rasterization is host-side cv2 like the reference.
"""
from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def crop_mask(masks, boxes):
    """Zero mask pixels outside each box. masks (n, h, w), boxes (n, 4) xyxy
    in mask-pixel coords (reference utils/segment/general.py:7-23)."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (n,1,1)
    r = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    c = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    return masks * ((r >= x1) * (r < x2) * (c >= y1) * (c < y2))


def process_mask(protos, masks_in, bboxes, shape, upsample=False):
    """Assemble per-detection masks from prototypes.

    protos (mh, mw, c) NHWC-style; masks_in (n, c) coefficients; bboxes (n, 4)
    xyxy in input-image pixels; shape = (ih, iw). Crop-before-upsample like
    the reference's default path (utils/segment/general.py:44-71).
    Returns bool (n, ih, iw) if upsample else (n, mh, mw).
    """
    mh, mw, c = protos.shape
    ih, iw = shape
    masks = jax.nn.sigmoid(masks_in @ protos.reshape(-1, c).T).reshape(-1, mh, mw)
    down = bboxes * jnp.array([mw / iw, mh / ih, mw / iw, mh / ih], bboxes.dtype)
    masks = crop_mask(masks, down)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
    return masks > 0.5


def mask_iou(mask1, mask2, eps: float = 1e-7):
    """Pairwise IoU of flattened binary masks: (N,HW),(M,HW)->(N,M)
    (reference utils/segment/metrics.py mask_iou)."""
    inter = mask1.astype(jnp.float32) @ mask2.astype(jnp.float32).T
    union = mask1.sum(1)[:, None] + mask2.sum(1)[None] - inter
    return inter / (union + eps)


def scale_image(im, target_shape):
    """Resize a mask/image back to the native shape, undoing letterbox
    (reference utils/segment/general.py scale_image)."""
    ih, iw = im.shape[:2]
    h0, w0 = target_shape[:2]
    gain = min(ih / h0, iw / w0)
    pad_w, pad_h = (iw - w0 * gain) / 2, (ih - h0 * gain) / 2
    top, left = int(pad_h), int(pad_w)
    bottom, right = int(ih - pad_h), int(iw - pad_w)
    cropped = np.asarray(im)[top:bottom, left:right]
    return cv2.resize(cropped.astype(np.float32), (w0, h0), interpolation=cv2.INTER_LINEAR)


# ---------------- host-side polygon rasterization ----------------


def polygon2mask(img_size, polygon, color=1, downsample_ratio=1):
    """One polygon (n, 2) pixel coords -> uint8 mask (reference
    utils/segment/dataloaders.py polygon2mask)."""
    mask = np.zeros(img_size, np.uint8)
    cv2.fillPoly(mask, [np.asarray(polygon, np.int32).reshape(-1, 2)], color=color)
    if downsample_ratio > 1:
        h, w = (img_size[0] // downsample_ratio, img_size[1] // downsample_ratio)
        mask = cv2.resize(mask, (w, h))
    return mask


def polygons2masks(img_size, polygons, color=1, downsample_ratio=1):
    """(n, h/d, w/d) stacked per-instance masks."""
    return np.stack([polygon2mask(img_size, p, color, downsample_ratio) for p in polygons]) if polygons else np.zeros(
        (0, img_size[0] // downsample_ratio, img_size[1] // downsample_ratio), np.uint8
    )


def polygons2masks_overlap(img_size, polygons, downsample_ratio=1):
    """One index map (h/d, w/d): pixel = instance idx + 1, larger instances
    drawn first so small ones win overlaps (reference
    utils/segment/dataloaders.py polygons2masks_overlap). Returns
    (index_map, sorted_order)."""
    h, w = img_size[0] // downsample_ratio, img_size[1] // downsample_ratio
    masks = np.zeros((h, w), np.int32)
    areas = []
    ms = []
    for p in polygons:
        m = polygon2mask(img_size, p, color=1, downsample_ratio=downsample_ratio)
        ms.append(m)
        areas.append(m.sum())
    order = np.argsort(-np.asarray(areas)) if areas else np.zeros(0, int)
    for rank, idx in enumerate(order):
        masks = np.where(ms[idx] > 0, idx + 1, masks)
    return masks, order


def masks2segments(masks, strategy="largest"):
    """Binary masks (n, h, w) -> polygon segments (reference
    utils/segment/general.py masks2segments)."""
    segments = []
    for m in np.asarray(masks).astype(np.uint8):
        contours = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if contours:
            if strategy == "concat":
                seg = np.concatenate([c.reshape(-1, 2) for c in contours])
            else:
                seg = max(contours, key=len).reshape(-1, 2)
        else:
            seg = np.zeros((0, 2))
        segments.append(seg.astype(np.float32))
    return segments
