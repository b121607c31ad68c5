"""Fixed-shape, on-device batched NMS for TPU.

Replaces the reference's host-side dynamic-shape pipeline around
``torchvision.ops.nms`` (reference: utils/general.py:884-994) with a fully
static-shape formulation that jits and vmaps:

- candidate selection = masked top-k (max_nms) instead of boolean gather;
- class-aware suppression via the same class-offset trick
  (reference: utils/general.py:975, offset = class_id * max_wh);
- greedy suppression computed exactly by a *tiled* algorithm: earlier tiles'
  kept boxes suppress later tiles with one (K, T) IoU matrix op per tile, and
  within a tile a bounded fixpoint iteration reproduces the sequential greedy
  order. This keeps the sequential depth at O(K/T * iters) instead of O(K).

Outputs are padded to ``max_det`` with a validity mask — the TPU-native
replacement for the reference's ragged per-image lists.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy


def _pairwise_iou(b1, b2, eps=1e-7):
    """xyxy IoU matrix (N,4),(M,4)->(N,M)."""
    a1, a2 = b1[:, None, :2], b1[:, None, 2:]
    c1, c2 = b2[None, :, :2], b2[None, :, 2:]
    inter = jnp.prod(jnp.clip(jnp.minimum(a2, c2) - jnp.maximum(a1, c1), 0, None), axis=-1)
    area1 = jnp.prod(a2 - a1, axis=-1)
    area2 = jnp.prod(c2 - c1, axis=-1)
    return inter / (area1 + area2 - inter + eps)


def greedy_suppress(boxes, active, iou_thres, tile: int = 256):
    """Exact greedy NMS keep-mask over score-descending ``boxes`` (K,4) xyxy.

    ``active`` marks real candidates (False rows never suppress / are never
    kept). Equivalent to iterating boxes in order and keeping each box iff no
    higher-scored *kept* box overlaps it above ``iou_thres``.
    """
    k = boxes.shape[0]
    if k % tile:
        tile = k  # degenerate: single tile
    nb = k // tile

    iou_all = _pairwise_iou(boxes, boxes)  # (K, K); K<=4096 -> <=64MB fp32, OK in HBM
    keep = jnp.zeros((k,), dtype=bool)

    def tile_body(t, keep):
        s = t * tile
        rows = jax.lax.dynamic_slice_in_dim(iou_all, s, tile, axis=1)  # (K, T)
        act_t = jax.lax.dynamic_slice_in_dim(active, s, tile, axis=0)  # (T,)

        # Cross-tile: any kept earlier box (global index < s) suppresses.
        idx = jnp.arange(k)
        earlier_kept = keep & (idx < s)
        sup_cross = jnp.any(earlier_kept[:, None] & (rows > iou_thres), axis=0)  # (T,)

        # Within-tile exact greedy by bounded fixpoint iteration.
        iou_t = jax.lax.dynamic_slice_in_dim(rows, s, tile, axis=0)  # (T, T)
        tri = jnp.tril(jnp.ones((tile, tile), dtype=bool), k=-1)  # i<j as [j, i] rows
        sup_mat = tri & (iou_t.T > iou_thres)  # sup_mat[j, i]: i (higher score) overlaps j

        base = act_t & ~sup_cross

        def fix_cond(carry):
            keep_in, changed, it = carry
            return changed & (it < tile)

        def fix_body(carry):
            keep_in, _, it = carry
            new_keep = base & ~jnp.any(sup_mat & keep_in[None, :], axis=1)
            return new_keep, jnp.any(new_keep != keep_in), it + 1

        keep_t, _, _ = jax.lax.while_loop(fix_cond, fix_body, (base, jnp.array(True), 0))
        return jax.lax.dynamic_update_slice_in_dim(keep, keep_t, s, axis=0)

    return jax.lax.fori_loop(0, nb, tile_body, keep)


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "multi_label",
        "agnostic",
        "max_det",
        "max_nms",
        "max_wh",
        "nc",
        "backend",
    ),
)
def non_max_suppression(
    prediction,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    multi_label: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
    max_wh: float = 7680.0,
    nc: int | None = None,
    backend: str = "xla",  # 'xla' (vmapped, batch-friendly) | 'pallas'
    # (single-kernel VMEM-resident suppression — fastest for standalone
    # large-K calls; see ops/pallas_nms.py)
):
    """Batched NMS over raw detector output ``prediction`` (B, N, 5+nc).

    Columns: (cx, cy, w, h, obj, cls...). Returns:

    - ``det``   (B, max_det, 6): (x1, y1, x2, y2, conf, cls), zero-padded
    - ``valid`` (B, max_det) bool mask
    - ``box_idx`` (B, max_det) int32 — index of each kept detection's source
      box in the input N axis (always returned; lets callers gather per-box
      extras such as segment mask coefficients through the suppression)

    Matches reference utils/general.py:884-994 semantics: obj-conf gate, then
    conf = obj * cls, multi-label expansion or best-class, class-offset boxes,
    greedy IoU suppression, max_det cap.
    """
    nc = nc if nc is not None else prediction.shape[2] - 5

    def one_image(x):  # (N, 5+nc)
        n = x.shape[0]
        obj = x[:, 4]
        cls_conf = x[:, 5 : 5 + nc] * obj[:, None]  # (N, nc)
        boxes = xywh2xyxy(x[:, :4])  # (N, 4)
        cand_gate = obj > conf_thres

        if multi_label and nc > 1:
            scores_flat = jnp.where(cand_gate[:, None], cls_conf, 0.0).reshape(-1)  # (N*nc,)
            scores_flat = jnp.where(scores_flat > conf_thres, scores_flat, 0.0)
            if classes is not None:
                cls_ok = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
                scores_flat = jnp.where(jnp.tile(cls_ok, n), scores_flat, 0.0)
            kk = min(max_nms, scores_flat.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores_flat, kk)
            src_idx = top_idx // nc
            cls_idx = (top_idx % nc).astype(jnp.float32)
            top_boxes = boxes[src_idx]
        else:
            conf = jnp.max(cls_conf, axis=1)
            cls_idx_all = jnp.argmax(cls_conf, axis=1)
            score = jnp.where(cand_gate & (conf > conf_thres), conf, 0.0)
            if classes is not None:
                cls_ok = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
                score = jnp.where(cls_ok[cls_idx_all], score, 0.0)
            kk = min(max_nms, n)
            top_scores, top_idx = jax.lax.top_k(score, kk)
            src_idx = top_idx
            top_boxes = boxes[top_idx]
            cls_idx = cls_idx_all[top_idx].astype(jnp.float32)

        if kk < max_nms:  # pad to static max_nms
            pad = max_nms - kk
            top_scores = jnp.pad(top_scores, (0, pad))
            top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
            cls_idx = jnp.pad(cls_idx, (0, pad))
            src_idx = jnp.pad(src_idx, (0, pad))

        active = top_scores > conf_thres
        offset = 0.0 if agnostic else cls_idx[:, None] * max_wh
        if backend == "pallas":
            from .pallas_nms import greedy_suppress_pallas

            keep = greedy_suppress_pallas(top_boxes + offset, active, iou_thres)
        else:
            keep = greedy_suppress(top_boxes + offset, active, iou_thres)

        # Select top max_det kept, preserving score order (already sorted).
        kept_scores = jnp.where(keep, top_scores, -1.0)
        out_scores, out_idx = jax.lax.top_k(kept_scores, max_det)
        out_valid = out_scores > conf_thres
        det = jnp.concatenate(
            [top_boxes[out_idx], out_scores[:, None], cls_idx[out_idx, None]], axis=1
        )
        det = jnp.where(out_valid[:, None], det, 0.0)
        out_src = jnp.where(out_valid, src_idx[out_idx], 0).astype(jnp.int32)
        return det, out_valid, out_src

    return jax.vmap(one_image)(prediction)
