"""Segmentation loss: detection terms + prototype mask BCE.

Capability parity with reference utils/segment/loss.py (overlap=True mode):
box (CIoU) / obj / cls exactly like the detection loss, plus a per-positive
mask term: pred = coeffs @ proto, BCE against the ground-truth instance mask
(from the overlap index map), cropped to the target box and area-normalized.

TPU-first: the reference loops over images and ragged positives; here the
mask term runs over a fixed budget of K positives per image per level
(positives beyond K are dropped from the mask term only — box/obj/cls remain
exact), keeping every shape static.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.iou import bbox_iou
from .loss import BALANCE, LossConfig, _level_assignments, bce_with_logits, smooth_bce


@dataclass(frozen=True)
class SegLossConfig(LossConfig):
    mask_budget: int = 32  # K positives per image per level for the mask term
    iou_kind: str = "ciou"  # upstream seg loss uses CIoU (utils/segment/loss.py:65)


def compute_seg_loss(preds, proto, targets, tmask, mask_index_map, cfg: SegLossConfig):
    """preds: list of (B, ny, nx, na, 5+nc+nm) raw maps; proto (B, mh, mw, nm);
    mask_index_map (B, mh, mw) int: pixel = target slot + 1, 0 = background
    (the overlap encoding; build with polygons2masks_overlap mapped to slots).

    Returns (scalar loss, components dict incl. 'seg')."""
    nl = len(preds)
    balance = BALANCE.get(nl, BALANCE[3])
    anchors = jnp.asarray(cfg.anchors, jnp.float32).reshape(nl, -1, 2)
    cp, cn = smooth_bce(cfg.label_smoothing)
    bs = preds[0].shape[0]
    nm = proto.shape[-1]
    mh, mw = proto.shape[1], proto.shape[2]
    k = cfg.mask_budget

    lbox = jnp.zeros(())
    lobj = jnp.zeros(())
    lcls = jnp.zeros(())
    lseg = jnp.zeros(())

    for i, pi in enumerate(preds):
        pi = pi.astype(jnp.float32)
        b_sz, ny, nx, na, no = pi.shape
        b, a, gj, gi, txy, twh, tcls, mask, tidx, xywhn = _level_assignments(
            targets, tmask, anchors[i], ny, nx, cfg.anchor_t
        )
        fmask = mask.astype(jnp.float32)
        n_pos = jnp.maximum(fmask.sum(), 1.0)

        ps = pi[b, gj, gi, a]  # (B, R, no)
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * anchors[i][a]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        unit = jnp.array([0.5, 0.5, 1.0, 1.0], jnp.float32)
        tbox = jnp.where(mask[..., None], jnp.concatenate([txy, twh], axis=-1), unit)
        iou = bbox_iou(pbox, tbox, xywh=True, kind=cfg.iou_kind)
        lbox = lbox + ((1.0 - iou) * fmask).sum() / n_pos

        iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
        tobj = jnp.zeros((b_sz, ny, nx, na), jnp.float32)
        tobj = tobj.at[b, gj, gi, a].max(jnp.where(mask, iou_d, 0.0))
        lobj = lobj + bce_with_logits(pi[..., 4], tobj, cfg.obj_pw).mean() * balance[i]

        if cfg.nc > 1:
            t_cls = jnp.where(jax.nn.one_hot(tcls, cfg.nc, dtype=bool), cp, jnp.full((1,), cn))
            cls_bce = bce_with_logits(ps[..., 5 : 5 + cfg.nc], t_cls, cfg.cls_pw)
            lcls = lcls + (cls_bce * fmask[..., None]).sum() / (n_pos * cfg.nc)

        # ---- mask term over a fixed K-positive budget per image ----
        # pick the first K valid candidates per image (rows are (B, R))
        order = jnp.argsort(~mask, axis=1, stable=True)[:, :k]  # valid rows first
        sel = lambda x: jnp.take_along_axis(x, order, axis=1)
        sel_mask = sel(mask)  # (B, K)
        sel_coef = jnp.take_along_axis(ps[..., 5 + cfg.nc :], order[..., None], axis=1)  # (B,K,nm)
        sel_tidx = sel(tidx)  # (B, K)
        sel_xywhn = jnp.take_along_axis(xywhn, order[..., None], axis=1)  # (B,K,4)

        pred_masks = jnp.einsum(
            "bkc,bhwc->bkhw", sel_coef, proto.astype(jnp.float32), preferred_element_type=jnp.float32
        )  # (B, K, mh, mw)
        gt = (mask_index_map[:, None, :, :] == (sel_tidx[:, :, None, None] + 1)).astype(jnp.float32)

        bce = bce_with_logits(pred_masks, gt)  # (B, K, mh, mw)
        # crop to target box in mask pixels, normalize by box area
        scale = jnp.array([mw, mh, mw, mh], jnp.float32)
        cxy, cwh = sel_xywhn[..., :2] * scale[:2], sel_xywhn[..., 2:] * scale[2:]
        boxes = jnp.concatenate([cxy - cwh / 2, cxy + cwh / 2], axis=-1)  # (B,K,4)
        x1 = boxes[..., 0][..., None, None]
        y1 = boxes[..., 1][..., None, None]
        x2 = boxes[..., 2][..., None, None]
        y2 = boxes[..., 3][..., None, None]
        r = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
        c = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
        inbox = (r >= x1) * (r < x2) * (c >= y1) * (c < y2)  # (B,K,mh,mw)
        area = jnp.maximum(sel_xywhn[..., 2] * sel_xywhn[..., 3], 1e-9)  # normalized area
        per_pos = (bce * inbox).mean(axis=(2, 3)) / area  # (B, K)
        n_sel = jnp.maximum(sel_mask.sum(), 1.0)
        lseg = lseg + (per_pos * sel_mask).sum() / n_sel

    lbox = lbox * cfg.box_w
    lobj = lobj * cfg.obj_w
    lcls = lcls * cfg.cls_w
    lseg = lseg * cfg.box_w / bs
    total = (lbox + lobj + lcls + lseg) * bs
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "seg": lseg}
