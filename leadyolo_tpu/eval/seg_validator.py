"""Segmentation validation: box mAP + mask mAP.

Capability parity with reference utils/segment/val.py: detections from the
Segment head keep their mask coefficients through NMS (via the suppression's
source-index output), per-detection masks assemble from the prototypes
(process_mask), and TP matrices are computed twice — box IoU and mask IoU —
feeding ap_per_class for mAP(box) / mAP(mask).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader
from ..data.seg_datasets import SegmentDataset
from ..ops.masks import crop_mask, mask_iou
from ..ops.metrics import ap_per_class, process_batch
from ..ops.nms import non_max_suppression


def _mask_process_batch(pred_masks, pred_cls, gt_masks, gt_cls, iouv):
    """Greedy TP matching on mask IoU (mirrors the box process_batch)."""
    n, m = pred_masks.shape[0], gt_masks.shape[0]
    correct = np.zeros((n, len(iouv)), bool)
    if n == 0 or m == 0:
        return correct
    iou = np.asarray(
        mask_iou(jnp.asarray(gt_masks.reshape(m, -1)), jnp.asarray(pred_masks.reshape(n, -1)))
    )
    correct_class = gt_cls[:, None] == pred_cls[None, :]
    for i in range(len(iouv)):
        x = np.nonzero((iou >= iouv[i]) & correct_class)
        if x[0].shape[0]:
            matches = np.stack([x[0], x[1], iou[x[0], x[1]]], axis=1)
            if x[0].shape[0] > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), i] = True
    return correct


def validate_seg(
    model,
    variables,
    data_path,
    img_size: int = 640,
    batch_size: int = 16,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    compute_dtype=jnp.float32,
    max_targets: int = 64,
    workers: int = 8,
):
    """Returns dict(box=..., mask=...) each with mp/mr/map50/map."""
    nc = model.nc
    nm = model.head.nm
    iouv = np.linspace(0.5, 0.95, 10)
    ds = SegmentDataset(data_path, img_size=img_size, augment=False, max_targets=max_targets)
    dl = DataLoader(ds, batch_size, shuffle=False, drop_last=False, workers=workers)

    @jax.jit
    def infer(variables, images):
        x = images.astype(compute_dtype) / 255.0
        dets, proto = model.apply(variables, x, train=False, decode=False)
        preds = model.decode(dets)  # (B, N, 5+nc+nm)
        det, valid, src = non_max_suppression(
            preds.astype(jnp.float32),
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            multi_label=nc > 1,
            max_det=max_det,
            max_nms=2048,
            nc=nc,
        )
        coefs = jnp.take_along_axis(preds[..., 5 + nc :], src[..., None], axis=1)  # (B, max_det, nm)

        # assemble per-detection masks at proto resolution, cropped to boxes
        def per_image(proto_i, coef_i, boxes_i):
            mh, mw = proto_i.shape[0], proto_i.shape[1]
            masks = jax.nn.sigmoid(coef_i @ proto_i.reshape(-1, nm).T).reshape(-1, mh, mw)
            scale = jnp.array([mw / img_size, mh / img_size, mw / img_size, mh / img_size], jnp.float32)
            return crop_mask(masks, boxes_i * scale) > 0.5

        masks = jax.vmap(per_image)(proto, coefs, det[..., :4])
        return det, valid, masks

    box_stats, mask_stats = [], []
    seen = 0
    for imgs, targets, tmask, maps in dl:
        b = imgs.shape[0]
        if b < batch_size:
            pad = batch_size - b
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        det, valid, masks = (np.asarray(t) for t in infer(variables, jnp.asarray(imgs)))

        for i in range(b):
            seen += 1
            v = valid[i]
            dv = det[i][v]
            dm = masks[i][v]
            lb = targets[i][tmask[i]]
            tb = np.zeros((len(lb), 5), np.float32)
            if len(lb):
                tb[:, 0] = lb[:, 0]
                cx, cy, w, h = (lb[:, j] * img_size for j in (1, 2, 3, 4))
                tb[:, 1:] = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
            box_stats.append((process_batch(dv, tb, iouv), dv[:, 4], dv[:, 5], tb[:, 0]))

            # ground-truth masks from the overlap index map, slot-aligned
            slots = np.nonzero(tmask[i])[0]
            gt_masks = np.stack([(maps[i] == s + 1).astype(np.float32) for s in slots]) if len(slots) else np.zeros((0,) + maps[i].shape, np.float32)
            mcorrect = _mask_process_batch(dm.astype(np.float32), dv[:, 5], gt_masks, tb[:, 0], iouv)
            mask_stats.append((mcorrect, dv[:, 4], dv[:, 5], tb[:, 0]))

    def reduce(stats):
        tp = np.concatenate([s[0] for s in stats]) if stats else np.zeros((0, 10), bool)
        conf = np.concatenate([s[1] for s in stats])
        pc = np.concatenate([s[2] for s in stats])
        tc = np.concatenate([s[3] for s in stats])
        if tp.shape[0] and tc.shape[0]:
            r = ap_per_class(tp, conf, pc, tc)
            return {
                "mp": float(r["p"].mean()),
                "mr": float(r["r"].mean()),
                "map50": float(r["ap50"].mean()),
                "map": float(r["ap_mean"].mean()),
            }
        return {"mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0}

    return {"box": reduce(box_stats), "mask": reduce(mask_stats), "seen": seen}
