"""Pallas TPU kernel: greedy NMS suppression with VMEM-resident state.

The XLA formulation in ops/nms.py materializes a (K, K) IoU matrix in HBM
(64 MB at K=4096) and re-reads (K, T) slices every tile step. Greedy NMS is
the one op in this pipeline XLA cannot schedule well: it is inherently
sequential over score order, with a tiny working set. This kernel keeps the
whole problem on-chip: boxes and the keep mask live in VMEM, IoU tiles are
computed on the fly, and the suppression reductions run as tiny MXU matmuls
((T,K)@(K,1)) — Mosaic-friendly: everything stays 2D with no sub-tile
transposes (the kernel takes a host-side transposed copy of the boxes, 64 KB).

Interface matches ops.nms.greedy_suppress; interpret mode makes it runnable
(and tested) on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_rows_cols(rows, colsT, eps=1e-7):
    """IoU of (R,4) row boxes vs (4,C) transposed col boxes -> (R,C)."""
    ax1, ay1, ax2, ay2 = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3], rows[:, 3:4]  # (R,1)
    cx1, cy1, cx2, cy2 = colsT[0:1, :], colsT[1:2, :], colsT[2:3, :], colsT[3:4, :]  # (1,C)
    iw = jnp.maximum(jnp.minimum(ax2, cx2) - jnp.maximum(ax1, cx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, cy2) - jnp.maximum(ay1, cy1), 0.0)
    inter = iw * ih
    area_r = (ax2 - ax1) * (ay2 - ay1)
    area_c = (cx2 - cx1) * (cy2 - cy1)
    return inter / (area_r + area_c - inter + eps)


def _nms_kernel(boxes_ref, boxesT_ref, active_ref, keep_ref, *, iou_thres: float, tile: int):
    k = boxes_ref.shape[0]
    nb = k // tile
    boxesT = boxesT_ref[:]  # (4, K)
    keep_ref[:] = jnp.zeros((k, 1), jnp.int32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def tile_body(t, _):
        s = pl.multiple_of(t * tile, tile)
        bt = boxes_ref[pl.ds(s, tile), :]  # (T, 4)
        iou_tk = _iou_rows_cols(bt, boxesT)  # (T, K) — on the fly, never in HBM

        kept = (keep_ref[:] != 0) & (row_ids < s)  # (K, 1) earlier kept
        # reduce over K as a matmul: (T,K)@(K,1) -> (T,1)
        sup_cross = (
            jnp.dot(
                (iou_tk > iou_thres).astype(jnp.float32),
                kept.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        )  # (T, 1)

        btT = boxesT_ref[:, pl.ds(s, tile)]  # (4, T)
        iou_tt = _iou_rows_cols(bt, btT)  # (T, T)
        rows_t = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        cols_t = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        # sup_mat[j, i]: higher-scored i (i<j) overlaps j (IoU symmetric)
        sup_mat = ((cols_t < rows_t) & (iou_tt > iou_thres)).astype(jnp.float32)

        act_t = active_ref[pl.ds(s, tile), :] != 0  # (T, 1)
        base = act_t & ~sup_cross  # (T, 1)

        # Convergence-tested fixpoint — EXACT for arbitrary suppression-chain
        # depth. The map f(keep) = base & ~(sup_mat @ keep) has a strictly
        # lower-triangular dependency, so any fixpoint equals the sequential
        # greedy solution (unique by induction over score order); we iterate
        # until nothing changes (<= chain depth + 1 steps, typically 2-4).
        # Mosaic cannot carry vectors through a data-dependent while, so the
        # vector state lives in the keep_ref tile slice and the carry is a
        # scalar (iteration count, changed flag).
        keep_ref[pl.ds(s, tile), :] = base.astype(jnp.int32)

        def fix_cond(c):
            it, changed = c
            return changed & (it < tile)

        def fix_body(c):
            it, _ = c
            cur = keep_ref[pl.ds(s, tile), :].astype(jnp.float32)  # (T,1)
            hit = jnp.dot(sup_mat, cur, preferred_element_type=jnp.float32) > 0.5
            new = base & ~hit
            keep_ref[pl.ds(s, tile), :] = new.astype(jnp.int32)
            return it + 1, jnp.any(new != (cur > 0.5))

        jax.lax.while_loop(fix_cond, fix_body, (0, jnp.bool_(True)))
        return 0

    jax.lax.fori_loop(0, nb, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_thres", "tile", "interpret"))
def greedy_suppress_pallas(boxes, active, iou_thres: float = 0.45, tile: int = 256, interpret: bool = False):
    """Drop-in for ops.nms.greedy_suppress: (K,4) xyxy score-sorted boxes +
    (K,) active mask -> (K,) keep mask. Exact (convergence-tested fixpoint)."""
    k = boxes.shape[0]
    if k % tile:
        tile = k
    boxes = boxes.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=iou_thres, tile=tile),
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(boxes, boxes.T, active.astype(jnp.int32)[:, None])
    return out[:, 0] != 0
