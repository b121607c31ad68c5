"""Fused RFCBAMConv inference kernel (Pallas, TPU).

The XLA formulation of RFCBAMConv (nn/rfa.py, reference models/rfa.py:95-129)
materializes the k^2-expanded per-tap feature map in HBM three times per layer
(grouped-conv write, attention read, gated-contraction read) — ~2 GB of HBM
traffic for the 80x80 P3 head layer at batch 128, the hottest layer of the
network (README "Performance" roofline: 7.67 ms of a ~22 ms e2e batch). This
kernel keeps the expansion in VMEM: per grid step it reads a row-block of one
image, generates the 9 tap planes, applies the SE channel gate and the CBAM
spatial gate, and contracts straight onto the MXU — HBM sees only x once in
and the output once out (~4.5x traffic cut).

STATUS (round-3 A/B on the real chip, runs/fused_ab/AB_r03.json): numerically
interchangeable with the XLA path (p99 |diff| 1.2e-4 at batch 128, production
shapes) but 0.89x its speed — the flattened-matmul tap contraction
(nn/rfa.py:52-60) made the XLA path faster than this kernel's VPU-bound tap
generation. Kept as an opt-in (--fused / LEADYOLO_FUSED=1); bench.py
re-enables it only if a future tools/fused_ab.py run records ok AND faster.

The grid is (batch, row_blocks). Each step works on `hb` output rows plus a
one-row feature halo on each side, because the CBAM spatial 3x3 crosses
k-block boundaries and therefore needs the neighbouring rows' tap statistics.
The overlapping input windows are prepared by XLA as static slices (cheap —
the un-expanded input is ~9x smaller than the tap planes this kernel avoids
spilling); halo rows that fall outside the image are masked to zero in the
statistics so the spatial gate sees the same zero padding as the XLA path.
Whole images that fit VMEM compile to a single row block, so the small-image
case is the degenerate nblk=1 instance of the same kernel.

Scope: k=3, stride=2 (the LEAD-YOLO head downsampling convs, layers 17/20);
inference only (the training path keeps the autodiff-friendly XLA form). The
strided taps are decomposed into four even/odd quadrant views prepared by XLA
so every in-kernel access is unit-stride. Numerics mirror the XLA path: fp32
accumulation, fp32 folded BatchNorm (eps 1e-3), bf16 tap features and matmul
inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tap index t = ty*3 + tx everywhere (genconv group channel order, the
# expanded-map layout, and the contraction weight's leading axis all agree —
# nn/rfa.py keeps the same convention).
_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]

# Per-step VMEM budget for picking the row block. v5e VMEM is 16 MiB; leave
# headroom for Mosaic spills/double-buffering beyond what we model.
_VMEM_BUDGET = 9 * 2**20


def pick_row_block(hh: int, ww: int, c: int, c2: int) -> int | None:
    """Largest divisor of hh whose estimated per-step VMEM fits the budget.

    None means no divisor fits (caller should fall back to the XLA path).
    """
    for hb in range(hh, 0, -1):
        if hh % hb:
            continue
        est = (
            4 * (hb + 3) * (ww + 1) * c * 2 * 2  # quadrant windows (bf16, 2x buffered)
            + 9 * (hb + 2) * ww * c * 2  # bf16 tap planes
            + 2 * (hb + 2) * ww * c * 4  # fp32 accumulator + cast transient
            + 36 * (hb + 2) * (ww + 2) * 4  # max/mean stats + padded copies
            + hb * ww * c2 * 2 * 2  # output block (2x buffered)
            + 9 * c * c2 * 2  # contraction weight
            + (9 + 9 + 27) * c * 4  # folded BN + generate taps
        )
        if est <= _VMEM_BUDGET:
            return hb
    return None


def supports(shape, c2: int) -> bool:
    """True if the fused kernel can handle this (B, H, W, C) input."""
    _, h, w, c = shape
    if h % 2 or w % 2:
        return False
    return pick_row_block(h // 2, w // 2, c, c2) is not None


def _kernel(x_ee, x_eo, x_oe, x_oo, se, wg, sg, bg, ws, w2, so, bo, out_ref, *, hb, hh, ww, c, c2):
    """One (image, row-block) per grid step; everything lives in VMEM.

    x_pp: (1, 1, hb+3, ww+1, c) even/odd quadrant windows of the padded input
          (row r of the window = quadrant row j*hb - 1 + r, zeros outside)
    se:   (1, c)        SE channel gate
    wg:   (3, 3, c, 9)  generate-conv taps (group-major reshaped)
    sg/bg:(9, c)        folded generate-BN scale/bias per tap plane
    ws:   (9, 2)        spatial 3x3 conv taps (max, mean channels)
    w2:   (9, c, c2)    tap-contraction weight
    so/bo:(c2,)         folded output BN scale/bias (conv bias included)
    out:  (1, hb, ww, c2)
    """
    j = pl.program_id(1)
    quads = {(0, 0): x_ee, (0, 1): x_eo, (1, 0): x_oe, (1, 1): x_oo}
    wg = wg[:]
    sg = sg[:]
    bg = bg[:]
    ws = ws[:]
    so = so[:]
    bo = bo[:]

    def tap_slice(dy, dx):
        pr, orow = (dy & 1), (dy >> 1)
        pc, ocol = (dx & 1), (dx >> 1)
        return quads[(pr, pc)][0, 0, orow : orow + hb + 2, ocol : ocol + ww, :]

    # Halo validity: local feature row fr is global row j*hb - 1 + fr; rows
    # outside [0, hh) are the zero padding of the expanded arrangement, so
    # their max/mean statistics must be exactly zero (BN bias would otherwise
    # leak through ReLU on the zero input rows).
    gr = j * hb - 1 + jax.lax.broadcasted_iota(jnp.int32, (hb + 2, ww), 0)
    mask = jnp.logical_and(gr >= 0, gr < hh).astype(jnp.float32)

    # --- generate the 9 tap planes: depthwise 3x3 (VPU) + folded BN + ReLU ---
    feats = []
    stats_mx = []
    stats_mn = []
    for t in range(9):
        acc = jnp.zeros((hb + 2, ww, c), jnp.float32)
        for tapk, (dy, dx) in enumerate(_TAPS):
            acc = acc + tap_slice(dy, dx).astype(jnp.float32) * wg[dy, dx, :, t][None, None, :]
        ft = jnp.maximum(acc * sg[t][None, None, :] + bg[t][None, None, :], 0.0)
        ft = ft.astype(jnp.bfloat16)
        feats.append(ft)
        f32 = ft.astype(jnp.float32)
        stats_mx.append(jnp.max(f32, axis=-1) * mask)
        stats_mn.append(jnp.mean(f32, axis=-1) * mask)

    # --- CBAM spatial attention over the (hh*3, ww*3) expanded arrangement ---
    # expanded pixel (3i+ty, 3j+tx) = stats[t=(ty,tx)][i,j]; its 3x3 conv taps
    # land on plane (ty+dy)%3 shifted by floor((ty+dy)/3) blocks, so each of
    # the 81 terms is a unit-stride shifted plane — no strided access needed.
    # Rows ride the halo (local stats rows 0..hb+1 cover every by shift);
    # columns keep the explicit zero pad.
    pad = lambda p: jnp.pad(p, ((0, 0), (1, 1)))
    mxp = [pad(p) for p in stats_mx]
    mnp = [pad(p) for p in stats_mn]
    rf = []
    for ty in range(3):
        for tx in range(3):
            acc = jnp.zeros((hb, ww), jnp.float32)
            for dy in range(-1, 2):
                vy = ty + dy
                by, sy = vy // 3, vy % 3
                for dx in range(-1, 2):
                    vx = tx + dx
                    bx, sx = vx // 3, vx % 3
                    src = sy * 3 + sx
                    wmx = ws[(dy + 1) * 3 + (dx + 1), 0]
                    wmn = ws[(dy + 1) * 3 + (dx + 1), 1]
                    blk_mx = mxp[src][1 + by : 1 + by + hb, 1 + bx : 1 + bx + ww]
                    blk_mn = mnp[src][1 + by : 1 + by + hb, 1 + bx : 1 + bx + ww]
                    acc = acc + blk_mx * wmx + blk_mn * wmn
            rf.append(jax.nn.sigmoid(acc))

    # --- gate + tap contraction on the MXU (interior rows only) ---
    sev = se[:][0, 0].astype(jnp.bfloat16)  # (c,)
    acc = jnp.zeros((hb * ww, c2), jnp.float32)
    for t in range(9):
        g = feats[t][1 : hb + 1] * sev[None, None, :] * rf[t][:, :, None].astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            g.reshape(hb * ww, c), w2[t], preferred_element_type=jnp.float32
        )
    y = jnp.maximum(acc * so[None, :] + bo[None, :], 0.0)
    out_ref[0] = y.reshape(hb, ww, c2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("c2", "interpret", "row_block"))
def rfcbam_fused_infer(x, se_gate, p, bstats, c2: int, interpret: bool = False,
                       row_block: int | None = None):
    """Fused inference forward of RFCBAMConv with k=3, s=2.

    x: (B, H, W, C) with H, W even; se_gate: (B, 1, 1, C) from the SE module;
    p / bstats: the module's "params" / "batch_stats" subtrees (same pytree
    the XLA path trains — generate_conv, generate_bn, get_weight_conv,
    conv_kernel/conv_bias, conv_bn). row_block overrides the VMEM-fit row
    tiling (tests use it to exercise multi-block grids on small shapes).
    Returns (B, H//2, W//2, c2).
    """
    b, h, w, c = x.shape
    hh, ww = h // 2, w // 2
    hb = row_block if row_block is not None else pick_row_block(hh, ww, c, c2)
    if hb is None or hh % hb:
        raise ValueError(f"no VMEM-fitting row block for hh={hh} ww={ww} c={c} c2={c2}")
    nblk = hh // hb

    # quadrant views of the zero-padded input: quad[pr][pc][i,j] = xp[2i+pr, 2j+pc],
    # then one extra zero row each side so every row block can take a halo.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quads = []
    for pr in (0, 1):
        for pc in (0, 1):
            xq = jnp.pad(xp[:, pr::2, pc::2, :], ((0, 0), (1, 1), (0, 0), (0, 0)))
            # overlapping row windows: block j covers quadrant rows
            # [j*hb - 1, j*hb + hb + 2) in original coordinates
            quads.append(
                jnp.stack([xq[:, j * hb : j * hb + hb + 3] for j in range(nblk)], axis=1)
            )
    x_ee, x_eo, x_oe, x_oo = quads

    # generate-conv taps: flax grouped kernel (3,3,1,C*9) is group(=channel)-major
    wg = p["generate_conv"]["kernel"].astype(jnp.float32).reshape(3, 3, c, 9)
    # folded generate-BN per (c, t) -> per-plane (9, c)
    gbn, gbs = p["generate_bn"], bstats["generate_bn"]
    inv = jax.lax.rsqrt(gbs["var"] + 1e-3) * gbn["scale"]
    sg = inv.reshape(c, 9).T
    bg = (gbn["bias"] - gbs["mean"] * inv).reshape(c, 9).T
    # spatial conv taps (3,3,2,1) -> (9, 2)
    ws = p["get_weight_conv"]["kernel"].astype(jnp.float32).reshape(9, 2)
    # contraction (9, c, c2) + folded output BN (conv bias absorbed)
    w2 = p["conv_kernel"].astype(jnp.bfloat16)
    obn, obs = p["conv_bn"], bstats["conv_bn"]
    so = jax.lax.rsqrt(obs["var"] + 1e-3) * obn["scale"]
    bo = (p["conv_bias"] - obs["mean"]) * so + obn["bias"]

    se2 = se_gate.reshape(b, 1, c).astype(jnp.float32)

    win_spec = pl.BlockSpec(
        (1, 1, hb + 3, ww + 1, c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, hb=hb, hh=hh, ww=ww, c=c, c2=c2)
    return pl.pallas_call(
        kern,
        grid=(b, nblk),
        in_specs=[
            win_spec, win_spec, win_spec, win_spec,
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            full((3, 3, c, 9)),
            full((9, c)),
            full((9, c)),
            full((9, 2)),
            full((9, c, c2)),
            full((c2,)),
            full((c2,)),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, ww, c2), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c2), x.dtype),
        interpret=interpret,
    )(x_ee, x_eo, x_oe, x_oo, se2, wg, sg, bg, ws, w2, so, bo)
