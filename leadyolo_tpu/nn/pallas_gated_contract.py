"""Fused gated tap-contraction for the RFA attention convs (Pallas, TPU).

RFCBAMConv's inference tail (nn/rfa.py, reference models/rfa.py:119-129) is

    out = relu(bn((feat * ch_gate * rf_gate) @ W + bias))

where `feat` is the (B, H, W, C, k^2) per-tap feature map. XLA will not fuse
elementwise producers into a dot operand, so the gated tensor — the same size
as `feat`, 472 MB for the 80x80 P3 head layer at batch 128 — is materialized
to HBM and immediately read back by the matmul. MEASURED (real chip,
runs/fused_ab/GATED_PROBE_r04.json): the gating adds 1.47 ms to the
layer-17 tail vs the ungated contraction, ~= the 1.15 ms HBM round-trip of
the 472 MB tensor at peak bandwidth — the premise is confirmed and its cost
quantified.

VERDICT (runs/fused_ab/AB_r04.json, real chip, batch 128): this kernel is
numerically interchangeable with the XLA path (p99 |diff| <= 2.4e-4 on all
four RFCBAM layers) but SLOWER — geomean 0.652x, and 0.44x/0.49x on the
strided layers 17/20. The ~1.5 ms the fusion saves is dwarfed by the
kernel's own pipeline cost: 1024 small grid steps whose (rows, C*k^2) x
(C*k^2, 128) matmuls leave the MXU underutilized at N=128, plus the fp32
gate build on the VPU — the same contraction XLA runs in 4.6 ms takes this
kernel ~15 ms. The measured ceiling for ANY fused kernel here is the 1.5 ms
gating cost (~6 % of the forward), which bounds how much a better kernel
could win. XLA therefore stays the production path; this kernel stays
opt-in (LEADYOLO_FUSED=1) as the reference implementation of the fusion.

This kernel performs the gating in VMEM and feeds the MXU directly: per grid
step it loads a row block of `feat`, builds the (rows, C*k^2) gate as ONE
small MXU matmul, multiplies, contracts against the flattened weight, and
applies folded BatchNorm + ReLU before the single output write. HBM sees
`feat` once in and `out` once out.

The gate trick: with taps flattened c-major (index c*T + t, matching
nn/rfa.py's `_tap_contract` layout), the full gate factorizes as

    gate[r, c*T + t] = rf[r, t] * ch[c]        (rf per-position, ch per-image)

which is exactly the matmul  rf @ Pb  against the precomputed (T, C*T)
"placement" matrix Pb[t, c*T + t'] = ch[c] * (t == t').  Pb is tiny
(B x T x C*T bf16, ~3 MB at batch 128) and the matmul runs on the MXU, so no
sub-lane reshapes or tiled broadcasts are needed in-kernel.

Unlike the round-2 full-fusion kernel (git history: nn/pallas_rfcbam.py),
which also generated the taps in-kernel on the VPU and measured 0.89x XLA,
this kernel leaves the tap generation and the CBAM spatial-attention stats to
XLA (both are conv-shaped and XLA-friendly) and fuses only the part XLA
provably cannot: the dot-operand gating and the epilogue.

Scope: inference only (training keeps the autodiff-friendly XLA form); any
k, any stride (the kernel sees `feat` post-generation, so the generate
conv's stride is irrelevant here).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-step VMEM budget for picking the row block. v5e VMEM is 16 MiB; leave
# headroom for Mosaic double-buffering and spills beyond what we model.
_VMEM_BUDGET = 10 * 2**20


def pick_row_block(m: int, kdim: int, c_out: int) -> int | None:
    """Largest divisor of m (multiple of 8) whose per-step VMEM estimate fits.

    m = H*W rows, kdim = C*k^2 contraction width. None -> fall back to XLA.
    """
    for bm in range(min(m, 1024), 7, -1):
        if m % bm or bm % 8:
            continue
        est = (
            2 * bm * kdim * 2  # feat block (bf16, double-buffered)
            + 2 * bm * kdim * 2  # gate f32->bf16 transients (conservative)
            + bm * kdim * 2  # gated product
            + kdim * c_out * 2  # contraction weight
            + bm * c_out * 4  # fp32 accumulator
            + 2 * bm * c_out * 2  # output block (double-buffered)
        )
        if est <= _VMEM_BUDGET:
            return bm
    return None


def supports(feat_shape, c_out: int) -> bool:
    """True if the kernel can handle a (B, H, W, C, T) tap-feature map."""
    if len(feat_shape) != 5:
        return False
    _, h, w, c, t = feat_shape
    return pick_row_block(h * w, c * t, c_out) is not None


def _kernel(f_ref, rf_ref, pb_ref, w_ref, s_ref, o_ref, out_ref):
    # gate[r, c*T+t] = rf[r, t] * ch[c], built on the MXU via the placement
    # matmul (see module docstring)
    gate = jax.lax.dot(rf_ref[0], pb_ref[0], preferred_element_type=jnp.float32)
    g = (f_ref[0].astype(jnp.float32) * gate).astype(jnp.bfloat16)
    acc = jax.lax.dot(g, w_ref[...], preferred_element_type=jnp.float32)
    y = acc * s_ref[...] + o_ref[...]
    out_ref[0] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def gated_tap_contract(
    feat,
    rf_gate,
    ch_gate,
    w,
    bias,
    bn_scale,
    bn_bias,
    bn_mean,
    bn_var,
    interpret: bool = False,
    block_rows: int | None = None,
):
    """relu(bn((feat * ch_gate * rf_gate) @ W + bias)) without materializing
    the gated tensor.

    feat:    (B, H, W, C, T) bf16 per-tap features (T = k^2)
    rf_gate: (B, H, W, 1, T) CBAM spatial gate
    ch_gate: (B, 1, 1, C)    SE channel gate
    w:       (T, C, c_out)   tap-contraction weight (nn/rfa.py `conv_kernel`)
    bias:    (c_out,)        conv bias
    bn_*:    conv_bn params/stats, folded here (eps 1e-3, nn/layers.BatchNorm)

    Returns (B, H, W, c_out) in feat.dtype.
    """
    b, h, w_, c, t = feat.shape
    c_out = w.shape[-1]
    m, kdim = h * w_, c * t
    bm = block_rows if block_rows is not None else pick_row_block(m, kdim, c_out)
    if bm is None or m % bm:
        raise ValueError(f"no VMEM-fitting row block for m={m} kdim={kdim} c_out={c_out}")
    nblk = m // bm

    f2 = feat.reshape(b, m, kdim)  # contiguous: (c, t) collapse is layout-free
    rf2 = rf_gate.astype(jnp.bfloat16).reshape(b, m, t)
    # Pb[b, t, c*T + t'] = ch[b, c] * (t == t')
    ch = ch_gate.astype(jnp.bfloat16).reshape(b, c)
    pb = (ch[:, None, :, None] * jnp.eye(t, dtype=jnp.bfloat16)[None, :, None, :]).reshape(
        b, t, kdim
    )
    # flattened weight, c-major — identical to nn/rfa._tap_contract
    w2 = w.astype(jnp.bfloat16).transpose(1, 0, 2).reshape(kdim, c_out)
    # folded output BatchNorm (conv bias absorbed)
    scale = (jax.lax.rsqrt(bn_var + 1e-3) * bn_scale).astype(jnp.float32)
    off = ((bias - bn_mean) * scale + bn_bias).astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, bm, kdim), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, t), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, kdim), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, c_out), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, c_out), feat.dtype),
        interpret=interpret,
    )(f2, rf2, pb, w2, scale[None], off[None])
    return out.reshape(b, h, w_, c_out)
