"""Detection loss: EIoU box loss + BCE objectness/class with dense targets.

Capability parity with reference utils/loss.py:91-268 (ComputeLoss +
build_targets), re-expressed TPU-first:

The reference builds variable-length index lists (gather/scatter of ragged
positives). Here every (image, target-slot, anchor, offset-candidate) tuple is
a dense row with a validity mask — shapes are static, everything vmaps/jits,
and the scatter into the objectness map is a single segment-max. Semantics
match exactly:

- anchor-ratio filter max(r, 1/r) < anchor_t          (utils/loss.py:223-226)
- 3-cell neighbor assignment, +-0.5 offsets, 5 candidates (utils/loss.py:228-244)
- box loss = 1 - EIoU (utils/loss.py:142-160), objectness targets = clamped
  IoU (utils/loss.py:163-178), BCE-with-logits + label smoothing + optional
  focal wrapper (utils/loss.py:101-109), per-level balance [4.0, 1.0, 0.4].

Targets come padded: ``targets`` (B, T, 5) = (cls, x, y, w, h) normalized to
[0, 1], ``tmask`` (B, T) marking real rows.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.iou import bbox_iou

# per-level objectness balance (reference utils/loss.py:112)
BALANCE = {3: (4.0, 1.0, 0.4), 5: (4.0, 1.0, 0.25, 0.06, 0.02)}

# candidate offsets: center, left, up, right, down (reference utils/loss.py:231-239)
_OFFSETS = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]) * 0.5


def smooth_bce(eps: float = 0.0) -> Tuple[float, float]:
    """Positive/negative BCE targets for label smoothing
    (reference utils/loss.py:33-36)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive-class weight (torch
    BCEWithLogitsLoss semantics)."""
    log_p = -jax.nn.softplus(-logits)
    log_not_p = -jax.nn.softplus(logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_scale(logits, targets, gamma: float, alpha: float = 0.25):
    """Focal-loss modulation factor (reference utils/loss.py:39-64)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_f * (1.0 - p_t) ** gamma


@dataclass(frozen=True)
class LossConfig:
    nc: int
    anchors: Tuple  # (nl, na, 2) in GRID units (anchors_px / stride)
    strides: Tuple[int, ...]
    box_w: float = 0.05
    obj_w: float = 1.0
    cls_w: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    gr: float = 1.0  # obj IoU ratio (reference self.gr)
    iou_kind: str = "eiou"  # the LEAD-YOLO fork's silent change (utils/loss.py:142)

    @staticmethod
    def from_hyp(model, hyp: dict, imgsz: int = 640):
        """Build from a hyp dict with the reference's nl/nc/imgsz scaling
        (reference train.py:238-246)."""
        nl = len(model.strides)
        return LossConfig(
            nc=model.nc,
            anchors=tuple(map(tuple, model.anchors_grid.reshape(nl, -1).tolist())),
            strides=tuple(model.strides),
            box_w=hyp.get("box", 0.05) * 3.0 / nl,
            cls_w=hyp.get("cls", 0.5) * model.nc / 80.0 * 3.0 / nl,
            obj_w=hyp.get("obj", 1.0) * (imgsz / 640.0) ** 2 * 3.0 / nl,
            cls_pw=hyp.get("cls_pw", 1.0),
            obj_pw=hyp.get("obj_pw", 1.0),
            anchor_t=hyp.get("anchor_t", 4.0),
            fl_gamma=hyp.get("fl_gamma", 0.0),
            label_smoothing=hyp.get("label_smoothing", 0.0),
        )


def _level_assignments(targets, tmask, anchors_l, ny, nx, anchor_t):
    """Dense target assignment for one level.

    targets (B,T,5) normalized; anchors_l (na,2) grid units. Returns flat
    rows over (B,T,na,5cand): b, a, gj, gi, txy (offset in cell), twh (grid
    units), tcls, mask.
    """
    b_sz, t_sz, _ = targets.shape
    na = anchors_l.shape[0]

    gain = jnp.array([nx, ny, nx, ny], jnp.float32)
    cls = targets[..., 0]
    gxy = targets[..., 1:3] * gain[:2]  # (B,T,2) grid coords
    gwh = targets[..., 3:5] * gain[2:]  # (B,T,2) grid units

    # anchor ratio filter (B,T,na)
    r = gwh[:, :, None, :] / anchors_l[None, None, :, :]
    anchor_ok = jnp.maximum(r, 1.0 / r).max(axis=-1) < anchor_t
    anchor_ok &= tmask[:, :, None]

    # neighbor-cell candidate conditions (B,T) each (reference utils/loss.py:241-244)
    gx, gy = gxy[..., 0], gxy[..., 1]
    gxi, gyi = nx - gx, ny - gy
    j = (gx % 1 < 0.5) & (gx > 1)
    k = (gy % 1 < 0.5) & (gy > 1)
    l = (gxi % 1 < 0.5) & (gxi > 1)
    m = (gyi % 1 < 0.5) & (gyi > 1)
    cand = jnp.stack([jnp.ones_like(j), j, k, l, m], axis=-1)  # (B,T,5)

    # broadcast to (B,T,na,5)
    mask = anchor_ok[..., None] & cand[:, :, None, :]
    off = _OFFSETS  # (5,2)
    gij = jnp.floor(gxy[:, :, None, None, :] - off[None, None, None, :, :])  # (B,T,1,5,2)
    gij = jnp.broadcast_to(gij, (b_sz, t_sz, na, 5, 2))
    gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)
    gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

    txy = gxy[:, :, None, None, :] - jnp.stack([gi, gj], axis=-1).astype(jnp.float32)  # offset in [-0.5, 1.5]
    twh = jnp.broadcast_to(gwh[:, :, None, None, :], txy.shape)

    flat = lambda x: x.reshape(b_sz, -1, *x.shape[4:]) if x.ndim > 4 else x.reshape(b_sz, -1)
    b_idx = jnp.broadcast_to(jnp.arange(b_sz)[:, None, None, None], (b_sz, t_sz, na, 5))
    a_idx = jnp.broadcast_to(jnp.arange(na)[None, None, :, None], (b_sz, t_sz, na, 5))
    t_idx = jnp.broadcast_to(jnp.arange(t_sz)[None, :, None, None], (b_sz, t_sz, na, 5))
    xywhn = jnp.broadcast_to(targets[:, :, None, None, 1:5], (b_sz, t_sz, na, 5, 4))
    return (
        flat(b_idx.astype(jnp.int32)),
        flat(a_idx.astype(jnp.int32)),
        flat(gj),
        flat(gi),
        txy.reshape(b_sz, -1, 2),
        twh.reshape(b_sz, -1, 2),
        flat(jnp.broadcast_to(cls[:, :, None, None], (b_sz, t_sz, na, 5)).astype(jnp.int32)),
        flat(mask),
        flat(t_idx.astype(jnp.int32)),
        xywhn.reshape(b_sz, -1, 4),
    )


def compute_loss(preds: Sequence[jax.Array], targets, tmask, cfg: LossConfig):
    """Total detection loss.

    preds: list of raw (B, ny, nx, na, no) maps. Returns
    (scalar_loss, dict(box=?, obj=?, cls=?)) — scalar is already scaled by
    batch size like the reference (utils/loss.py:189-191).
    """
    nl = len(preds)
    # any nl != 3 falls back to the 5-element table (reference utils/loss.py:112);
    # a 4-level P6 model indexes the first four entries
    balance = BALANCE.get(nl, BALANCE[5])
    anchors = jnp.asarray(cfg.anchors, jnp.float32).reshape(nl, -1, 2)
    cp, cn = smooth_bce(cfg.label_smoothing)
    bs = preds[0].shape[0]

    lbox = jnp.zeros(())
    lobj = jnp.zeros(())
    lcls = jnp.zeros(())

    for i, pi in enumerate(preds):
        pi = pi.astype(jnp.float32)
        b_sz, ny, nx, na, no = pi.shape
        b, a, gj, gi, txy, twh, tcls, mask, _, _ = _level_assignments(
            targets, tmask, anchors[i], ny, nx, cfg.anchor_t
        )
        fmask = mask.astype(jnp.float32)
        n_pos = jnp.maximum(fmask.sum(), 1.0)

        # gather predictions at assigned cells: (B, R, no)
        ps = pi[b, gj, gi, a]

        # box: decoded against the assigned anchor (reference utils/loss.py:135-141)
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * anchors[i][a]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        # sanitize masked rows to a benign unit box: keeps IoU math finite so
        # masked gradients are exactly zero, not NaN*0
        safe = jnp.concatenate([txy, twh], axis=-1)
        unit = jnp.array([0.5, 0.5, 1.0, 1.0], jnp.float32)
        tbox = jnp.where(mask[..., None], safe, unit)
        if cfg.iou_kind == "wiou":
            # WIoU v1 (reference utils/loss.py:146-148): distance-weighted
            iou, dist = bbox_iou(pbox, tbox, xywh=True, kind="wiou")
            lbox = lbox + (jax.lax.stop_gradient(dist) * (1.0 - iou) * fmask).sum() / n_pos
        else:
            iou = bbox_iou(pbox, tbox, xywh=True, kind=cfg.iou_kind)  # (B, R)
            lbox = lbox + ((1.0 - iou) * fmask).sum() / n_pos

        # objectness target map via segment-max of clamped IoU
        iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
        if cfg.gr < 1.0:
            iou_d = (1.0 - cfg.gr) + cfg.gr * iou_d
        tobj = jnp.zeros((b_sz, ny, nx, na), jnp.float32)
        tobj = tobj.at[b, gj, gi, a].max(jnp.where(mask, iou_d, 0.0))

        obj_bce = bce_with_logits(pi[..., 4], tobj, cfg.obj_pw)
        if cfg.fl_gamma > 0:
            obj_bce = obj_bce * focal_scale(pi[..., 4], tobj, cfg.fl_gamma)
        lobj = lobj + obj_bce.mean() * balance[i]

        if cfg.nc > 1:
            t_cls = jnp.full((ps.shape[0], ps.shape[1], cfg.nc), cn)
            t_cls = jnp.where(
                jax.nn.one_hot(tcls, cfg.nc, dtype=bool), cp, t_cls
            )
            cls_bce = bce_with_logits(ps[..., 5 : 5 + cfg.nc], t_cls, cfg.cls_pw)
            if cfg.fl_gamma > 0:
                cls_bce = cls_bce * focal_scale(ps[..., 5 : 5 + cfg.nc], t_cls, cfg.fl_gamma)
            lcls = lcls + (cls_bce * fmask[..., None]).sum() / (n_pos * cfg.nc)

    lbox = lbox * cfg.box_w
    lobj = lobj * cfg.obj_w
    lcls = lcls * cfg.cls_w
    total = (lbox + lobj + lcls) * bs
    return total, {"box": lbox, "obj": lobj, "cls": lcls}
