"""Attention modules: SE variants, Coordinate Attention, C3_CA (LEAD-YOLO).

Capability parity with reference models/common.py:1565-1637 (CoordAtt family,
arXiv 2103.02907), models/rfa.py:77-92 (SE), models/common.py:1928-1946
(SeBlock). NHWC/TPU-first: the H/W axis pools are plain jnp means, the 1x1
convs over pooled vectors are matmuls on the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .functional import get_activation, hsigmoid, hswish, lazy_cat
from .layers import BatchNorm, Conv, Conv2d, Linear


class SE(nn.Module):
    """Squeeze-excitation with an *absolute* hidden width (reference
    models/rfa.py:77-92: nn.Linear(c, ratio) — ratio is the hidden size, not a
    divisor). Returns the (B,1,1,C) gate, like the reference (caller multiplies)."""

    ratio: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = Linear(self.ratio, use_bias=False, name="fc_0")(y)
        y = jnp.maximum(y, 0)
        y = Linear(c, use_bias=False, name="fc_2")(y)
        y = jax.nn.sigmoid(y)
        return y[:, None, None, :]


class SeBlock(nn.Module):
    """SE with conv FCs and reduction divisor (reference models/common.py:1928-1946);
    multiplies the input (unlike SE above)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(c // self.reduction, 1, use_bias=True, name="fc1")(y)
        y = jnp.maximum(y, 0)
        y = Conv2d(c, 1, use_bias=True, name="fc2")(y)
        return x * jax.nn.sigmoid(y)


class CoordAtt(nn.Module):
    """Coordinate attention (reference models/common.py:1583-1609).

    Pools along H and W separately, runs a shared 1x1 conv + BN + h_swish over
    the concatenated (h+w) strip, then per-axis 1x1 convs + sigmoid produce
    (B,H,1,C) and (B,1,W,C) gates multiplied into the identity.
    """

    oup: int
    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        x_h = jnp.mean(x, axis=2)  # (B, H, C)  — pool over W
        x_w = jnp.mean(x, axis=1)  # (B, W, C)  — pool over H
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = Conv2d(mip, 1, use_bias=True, name="conv1")(y)
        y = BatchNorm(name="bn1")(y, train)
        y = hswish(y)
        y_h, y_w = y[:, :h], y[:, h:]
        a_h = jax.nn.sigmoid(Conv2d(self.oup, 1, use_bias=True, name="conv_h")(y_h))  # (B,H,1,C)
        a_w = jax.nn.sigmoid(Conv2d(self.oup, 1, use_bias=True, name="conv_w")(y_w))  # (B,W,1,C)
        a_w = jnp.swapaxes(a_w, 1, 2)  # (B,1,W,C)
        return x * a_w * a_h


class CABottleneck(nn.Module):
    """Bottleneck + CoordAtt (reference models/common.py:1612-1623)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, name="cv2")(y, train)
        y = CoordAtt(self.c2, 32, name="ca")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class C3_CA(nn.Module):
    """C3 CSP block with CA bottlenecks (reference models/common.py:1626-1637)."""

    accepts_lazy_concat = True  # x only feeds cv1/cv2 (both Conv)

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y1 = CABottleneck(c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")(y1, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(lazy_cat([y1, y2]), train)
