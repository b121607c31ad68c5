"""Detection / segmentation / classification heads and the anchor decode.

Capability parity with reference models/yolo.py:39-170 (Detect/Segment) and
models/common.py:1132-1163 (Proto/Classify), TPU-first:

- Raw head outputs stay NHWC: (B, ny, nx, na, no) per level; channel layout
  (na, no) matches torch's view(bs, na, no, ny, nx) channel-major split so
  converted checkpoints line up.
- Decode is a separate pure function over static shapes; grids are constants
  folded at trace time (no lazy grid cache needed — XLA does the caching).
- Flattened prediction order is NHWC-natural (y, x, a) rather than torch's
  (a, y, x); NMS/mAP are order-invariant so parity holds at the box level.
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Conv, Conv2d, Linear
from ..nn.functional import upsample_nearest


def anchors_per_level(anchors) -> int:
    return len(anchors[0]) // 2


class Detect(nn.Module):
    """Per-level 1x1 conv heads (reference models/yolo.py:39-153). Returns the
    list of raw (B, ny, nx, na, no) maps; decode happens in decode_predictions."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return anchors_per_level(self.anchors)

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            y = Conv2d(self.no * self.na, 1, use_bias=True, name=f"m_{i}")(x)
            b, ny, nx, _ = y.shape
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


class Proto(nn.Module):
    """Mask prototype generator (reference models/common.py:1132-1142)."""

    c_: int = 256
    c2: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c_, k=3, name="cv1")(x, train)
        y = upsample_nearest(y, 2)
        y = Conv(self.c_, k=3, name="cv2")(y, train)
        return Conv(self.c2, name="cv3")(y, train)


class Segment(nn.Module):
    """Detect + mask coefficients + prototypes (reference models/yolo.py:156-170)."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    nm: int = 32
    npr: int = 256

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return anchors_per_level(self.anchors)

    @property
    def no(self):
        return self.nc + 5 + self.nm

    @nn.compact
    def __call__(self, xs, train: bool = False):
        proto = Proto(self.npr, self.nm, name="proto")(xs[0], train)
        outs = []
        for i, x in enumerate(xs):
            y = Conv2d(self.no * self.na, 1, use_bias=True, name=f"m_{i}")(x)
            b, ny, nx, _ = y.shape
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs, proto


class Classify(nn.Module):
    """Classification head (reference models/common.py:1147-1163):
    Conv to 1280 -> global pool -> dropout -> linear."""

    c2: int
    k: int = 1
    s: int = 1
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        y = Conv(1280, self.k, self.s, name="conv")(x, train)
        y = jnp.mean(y, axis=(1, 2))  # (B, 1280)
        if self.dropout_p > 0 and train:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.dropout_p
            mask = jax.random.bernoulli(rng, keep, y.shape)
            y = jnp.where(mask, y / keep, 0.0).astype(y.dtype)
        return Linear(self.c2, name="linear")(y)


def make_grids(shapes, anchors, strides):
    """Per-level (grid, anchor_grid) constants.

    grid[i]: (ny, nx, 2) cell coords (x, y); anchor_grid[i]: (na, 2) in pixels.
    Matches reference models/yolo.py:141-153 (grid has the -0.5 offset folded
    into the decode below rather than the grid, same arithmetic).
    """
    grids, agrids = [], []
    anchors = jnp.asarray(anchors, jnp.float32).reshape(len(strides), -1, 2)
    for (ny, nx), s, a in zip(shapes, strides, anchors):
        xv, yv = jnp.meshgrid(jnp.arange(nx, dtype=jnp.float32), jnp.arange(ny, dtype=jnp.float32))
        grids.append(jnp.stack([xv, yv], axis=-1))  # (ny, nx, 2)
        agrids.append(a * s)  # (na, 2) pixels
    return grids, agrids


def decode_predictions(outs, anchors, strides, nc, normalize=None):
    """Raw per-level maps -> (B, N, 5+nc[+extra]) box predictions in pixels.

    xy = (2*sigmoid - 0.5 + cell) * stride ; wh = (2*sigmoid)^2 * anchor_px
    (reference models/yolo.py:107-117). Extra trailing channels (segment mask
    coefficients) pass through un-sigmoided, like the reference.

    normalize: image size to put boxes in [0,1] AT THE SOURCE — the stride
    and anchor scales are pre-divided so no pixel-range tensor ever exists in
    the graph. int8 TFLite export needs this: the decode's channel concat
    gets one per-tensor scale, and pixel boxes (0..640) sharing it with
    probabilities (0..1) crush the latter to zero (the reference normalizes
    inside TFDetect for the same reason, models/tf.py:273-321).
    """
    no = outs[0].shape[-1]
    nmask = no - 5 - nc
    shapes = [(o.shape[1], o.shape[2]) for o in outs]
    grids, agrids = make_grids(shapes, anchors, strides)
    z = []
    for o, g, ag, s in zip(outs, grids, agrids, strides):
        if normalize:
            s = s / float(normalize)
            ag = ag / float(normalize)
        b, ny, nx, na, _ = o.shape
        xy, wh, conf, extra = jnp.split(o, (2, 4, 5 + nc), axis=-1)
        xy = (jax.nn.sigmoid(xy) * 2 - 0.5 + g[None, :, :, None, :].astype(o.dtype)) * s
        wh = jnp.square(jax.nn.sigmoid(wh) * 2) * ag[None, None, None, :, :].astype(o.dtype)
        conf = jax.nn.sigmoid(conf)
        y = jnp.concatenate([xy, wh, conf, extra], axis=-1) if nmask else jnp.concatenate([xy, wh, conf], axis=-1)
        z.append(y.reshape(b, ny * nx * na, no))
    return jnp.concatenate(z, axis=1)


def detect_bias_init(bias, stride, nc, img_size=640.0, class_freq=None, no=None):
    """Objectness/class prior bias init (reference models/yolo.py:352-359).

    ``bias``: (na*no,) flat conv bias for one level. ``no`` defaults to nc+5
    (Detect); Segment passes nc+5+nm. Returns updated array.
    """
    no = no or (nc + 5)
    na = bias.shape[0] // no
    b = bias.reshape(na, no)
    b = b.at[:, 4].add(math.log(8.0 / (img_size / stride) ** 2))
    if class_freq is None:
        b = b.at[:, 5 : 5 + nc].add(math.log(0.6 / (nc - 0.999999)))
    else:
        b = b.at[:, 5 : 5 + nc].add(jnp.log(class_freq / jnp.sum(class_freq)))
    return b.reshape(-1)
