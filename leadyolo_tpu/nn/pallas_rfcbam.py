"""Fused RFCBAMConv inference kernel (Pallas, TPU).

The XLA formulation of RFCBAMConv (nn/rfa.py, reference models/rfa.py:95-129)
materializes the k^2-expanded per-tap feature map in HBM three times per layer
(grouped-conv write, attention read, gated-contraction read) — ~2 GB of HBM
traffic for the 80x80 P3 head layer at batch 128, which made it the single
hottest layer of the network (5.3 ms of a 20.3 ms forward; see README
roofline). This kernel keeps the whole expansion in VMEM: per grid step it
reads one image's input tile, generates the 9 tap planes, applies the SE
channel gate and the CBAM spatial gate, and contracts straight onto the MXU —
HBM sees only x once in and the output once out (~4.5x traffic cut).

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


def _kernel(x_ee, x_eo, x_oe, x_oo, se, wg, sg, bg, ws, w2, so, bo, out_ref, *, hh, ww, c, c2):
    """One image per grid step; everything lives in VMEM.

    x_pp: (1, hh+1, ww+1, c) even/odd quadrants of the zero-padded input
    se:   (1, c)        SE channel gate
    wg:   (3, 3, c, 9)  generate-conv taps (group-major reshaped)
    sg/bg:(9, c)        folded generate-BN scale/bias per tap plane
    ws:   (9, 2)        spatial 3x3 conv taps (max, mean channels)
    w2:   (9, c, c2)    tap-contraction weight
    so/bo:(c2,)         folded output BN scale/bias (conv bias included)
    out:  (1, hh, ww, c2)
    """
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
        return quads[(pr, pc)][0, orow : orow + hh, ocol : ocol + ww, :]

    xs = {t: tap_slice(dy, dx).astype(jnp.float32) for t, (dy, dx) in enumerate(_TAPS)}

    # --- generate the 9 tap planes: depthwise 3x3 (VPU) + folded BN + ReLU ---
    feats = []
    stats_mx = []
    stats_mn = []
    for t in range(9):
        acc = jnp.zeros((hh, ww, c), jnp.float32)
        for tapk, (dy, dx) in enumerate(_TAPS):
            acc = acc + xs[tapk] * wg[dy, dx, :, t][None, None, :]
        ft = jnp.maximum(acc * sg[t][None, None, :] + bg[t][None, None, :], 0.0)
        ft = ft.astype(jnp.bfloat16)
        feats.append(ft)
        f32 = ft.astype(jnp.float32)
        stats_mx.append(jnp.max(f32, axis=-1))
        stats_mn.append(jnp.mean(f32, axis=-1))

    # --- CBAM spatial attention over the (hh*3, ww*3) expanded arrangement ---
    # expanded pixel (3i+ty, 3j+tx) = stats[t=(ty,tx)][i,j]; its 3x3 conv taps
    # land on plane (ty+dy)%3 shifted by floor((ty+dy)/3) blocks, so each of
    # the 81 terms is a unit-stride shifted plane — no strided access needed.
    pad = lambda p: jnp.pad(p, ((1, 1), (1, 1)))
    mxp = [pad(p) for p in stats_mx]
    mnp = [pad(p) for p in stats_mn]
    rf = []
    for ty in range(3):
        for tx in range(3):
            acc = jnp.zeros((hh, ww), jnp.float32)
            for dy in range(-1, 2):
                vy = ty + dy
                by, sy = vy // 3, vy % 3
                for dx in range(-1, 2):
                    vx = tx + dx
                    bx, sx = vx // 3, vx % 3
                    src = sy * 3 + sx
                    wmx = ws[(dy + 1) * 3 + (dx + 1), 0]
                    wmn = ws[(dy + 1) * 3 + (dx + 1), 1]
                    blk_mx = mxp[src][1 + by : 1 + by + hh, 1 + bx : 1 + bx + ww]
                    blk_mn = mnp[src][1 + by : 1 + by + hh, 1 + bx : 1 + bx + ww]
                    acc = acc + blk_mx * wmx + blk_mn * wmn
            rf.append(jax.nn.sigmoid(acc))

    # --- gate + tap contraction on the MXU ---
    sev = se[:][0, 0].astype(jnp.bfloat16)  # (c,)
    acc = jnp.zeros((hh * ww, c2), jnp.float32)
    for t in range(9):
        g = feats[t] * sev[None, None, :] * rf[t][:, :, None].astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            g.reshape(hh * ww, c), w2[t], preferred_element_type=jnp.float32
        )
    y = jnp.maximum(acc * so[None, :] + bo[None, :], 0.0)
    out_ref[0] = y.reshape(hh, ww, c2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("c2", "interpret"))
def rfcbam_fused_infer(x, se_gate, p, bstats, c2: int, interpret: bool = False):
    """Fused inference forward of RFCBAMConv with k=3, s=2.

    x: (B, H, W, C) with H, W even; se_gate: (B, 1, 1, C) from the SE module;
    p / bstats: the module's "params" / "batch_stats" subtrees (same pytree
    the XLA path trains — generate_conv, generate_bn, get_weight_conv,
    conv_kernel/conv_bias, conv_bn). Returns (B, H//2, W//2, c2).
    """
    b, h, w, c = x.shape
    hh, ww = h // 2, w // 2

    # quadrant views of the zero-padded input: quad[pr][pc][i,j] = xp[2i+pr, 2j+pc]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x_ee = xp[:, 0::2, 0::2, :]
    x_eo = xp[:, 0::2, 1::2, :]
    x_oe = xp[:, 1::2, 0::2, :]
    x_oo = xp[:, 1::2, 1::2, :]

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

    img_spec = pl.BlockSpec((1, hh + 1, ww + 1, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, hh=hh, ww=ww, c=c, c2=c2)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            img_spec, img_spec, img_spec, img_spec,
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((3, 3, c, 9)),
            full((9, c)),
            full((9, c)),
            full((9, 2)),
            full((9, c, c2)),
            full((c2,)),
            full((c2,)),
        ],
        out_specs=pl.BlockSpec((1, hh, ww, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c2), x.dtype),
        interpret=interpret,
    )(x_ee, x_eo, x_oe, x_oo, se2, wg, sg, bg, ws, w2, so, bo)
