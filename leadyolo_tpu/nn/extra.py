"""Optional blocks the reference carries but ships unused: DecoupledHead and
the iRMB/EMO inverted-residual-mobile block.

Capability parity with reference models/yolo.py:494-523 (YOLOX-style
decoupled cls/reg/obj head) and models/common.py:1315-1401 (iRMB windowed
attention + depthwise conv, arXiv 2301.01146; attn_pre=False default path).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import SeBlock
from .functional import get_activation
from .layers import BatchNorm, Conv, Conv2d


class DecoupledHead(nn.Module):
    """Per-level decoupled head: merge 1x1 -> cls branch (2x 3x3 conv + pred)
    and shared reg branch (2x 3x3 conv -> box pred + obj pred); outputs
    concat(box4, obj1, cls nc) * na channels."""

    nc: int = 80
    na: int = 3
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(256 * self.width)
        x = Conv(c, 1, 1, name="merge")(x, train)
        x1 = Conv(c, 3, 1, name="cls_convs1")(x, train)
        x1 = Conv(c, 3, 1, name="cls_convs2")(x1, train)
        x1 = Conv2d(self.nc * self.na, 1, use_bias=True, name="cls_preds")(x1)
        x2 = Conv(c, 3, 1, name="reg_convs1")(x, train)
        x2 = Conv(c, 3, 1, name="reg_convs2")(x2, train)
        box = Conv2d(4 * self.na, 1, use_bias=True, name="reg_preds")(x2)
        obj = Conv2d(1 * self.na, 1, use_bias=True, name="obj_preds")(x2)
        return jnp.concatenate([box, obj, x1], axis=-1)


class iRMB(nn.Module):
    """Inverted residual mobile block with windowed attention
    (reference models/common.py:1315-1401; default args as registered in
    parse_model — attention on, exp_ratio 1.0, dw_ks 3)."""

    c2: int
    norm_in: bool = True
    has_skip: bool = True
    exp_ratio: float = 1.0
    dw_ks: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dim_head: int = 64
    window_size: int = 7
    attn_s: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        dim_mid = int(c1 * self.exp_ratio)
        skip = self.has_skip and (c1 == self.c2) and (self.stride == 1)
        shortcut = x
        if self.norm_in:
            x = BatchNorm(name="norm")(x, train)

        b, h, w, _ = x.shape
        if self.attn_s and c1 % self.dim_head == 0:
            ws_h = self.window_size if self.window_size > 0 else h
            ws_w = self.window_size if self.window_size > 0 else w
            pad_b = (ws_h - h % ws_h) % ws_h
            pad_r = (ws_w - w % ws_w) % ws_w
            xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            hp, wp = h + pad_b, w + pad_r
            n1, n2 = hp // ws_h, wp // ws_w
            # (b, n1, ws_h, n2, ws_w, c) -> (b*n1*n2, ws_h, ws_w, c)
            xw = xp.reshape(b, n1, ws_h, n2, ws_w, c1).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws_h, ws_w, c1)

            heads = c1 // self.dim_head
            qk = Conv2d(c1 * 2, 1, name="qk")(xw)  # (B', h, w, 2c)
            bw = xw.shape[0]
            n_tok = ws_h * ws_w
            qk = qk.reshape(bw, n_tok, 2, heads, self.dim_head).transpose(2, 0, 3, 1, 4)
            q, k = qk[0], qk[1]  # (B', heads, n, dh)
            attn = jax.nn.softmax(
                jnp.einsum("bhnd,bhmd->bhnm", q, k) * (self.dim_head**-0.5), axis=-1
            )
            v = Conv2d(dim_mid, 1, name="v")(xw)
            v = get_activation("relu")(v)
            dh_v = dim_mid // heads
            vh = v.reshape(bw, n_tok, heads, dh_v).transpose(0, 2, 1, 3)
            xs = jnp.einsum("bhnm,bhmd->bhnd", attn, vh).transpose(0, 2, 1, 3).reshape(bw, ws_h, ws_w, dim_mid)
            # un-window
            xs = xs.reshape(b, n1, n2, ws_h, ws_w, dim_mid).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, dim_mid)
            x = xs[:, :h, :w]
        else:
            x = Conv2d(dim_mid, 1, name="v")(x)
            x = get_activation("relu")(x)

        y = Conv2d(dim_mid, self.dw_ks, self.stride, None, g=dim_mid, name="conv_local_conv")(x)
        y = BatchNorm(name="conv_local_bn")(y, train)
        y = get_activation("silu")(y)
        if skip:
            y = x + y if y.shape == x.shape else y
        if self.se_ratio > 0:
            y = SeBlock(max(1, int(1 / self.se_ratio)), name="se")(y, train)
        y = Conv2d(self.c2, 1, name="proj")(y)
        return shortcut + y if skip else y
