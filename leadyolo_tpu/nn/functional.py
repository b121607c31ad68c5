"""Low-level NHWC functional ops (conv, pooling, activations, shuffles).

These are the TPU-native replacements for the reference's cuDNN/ATen library
kernels (SURVEY.md §2.9): everything lowers to XLA HLO that the TPU compiler
tiles onto the MXU (convs) and VPU (elementwise), with NHWC layout so the
channel dim lands on the 128-wide lane axis.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def autopad(k, p=None, d=1):
    """Same-shape padding for odd kernels (reference: models/common.py:37)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class LazyConcat:
    """Deferred channel (axis -1) concat of NHWC feature maps.

    On an HBM-bound network, `jnp.concatenate` costs a full write + read of
    the combined tensor, and XLA will not fuse the concat into a consuming
    conv/dot operand. But a conv over a channel concat splits exactly:

        conv(cat(a, b), W) == conv(a, W[..., :ca, :]) + conv(b, W[..., ca:, :])

    so consumers that are convs (Conv2d) take the parts and slice their
    kernel instead — the concatenated tensor never exists. Consumers that
    can't split call ``materialize()`` (the graph executor does this
    automatically for modules without ``accepts_lazy_concat``).

    This is a trace-time wrapper only — it never crosses jit boundaries and
    is not a pytree."""

    __slots__ = ("parts",)

    def __init__(self, parts):
        flat = []
        for p in parts:
            if isinstance(p, LazyConcat):
                flat.extend(p.parts)
            else:
                flat.append(p)
        self.parts = tuple(flat)

    @property
    def shape(self):
        s = self.parts[0].shape
        return (*s[:-1], sum(p.shape[-1] for p in self.parts))

    @property
    def dtype(self):
        return self.parts[0].dtype

    @property
    def ndim(self):
        return self.parts[0].ndim

    def materialize(self):
        return self.parts[0] if len(self.parts) == 1 else jnp.concatenate(self.parts, axis=-1)


def lazy_cat(xs):
    """Channel concat that consuming convs can split (see LazyConcat)."""
    return LazyConcat(xs)


def materialize(x):
    return x.materialize() if isinstance(x, LazyConcat) else x


def conv2d(x, w, stride=1, padding=0, groups=1, dilation=1):
    """NHWC conv with HWIO weights; padding is an int/(ph, pw) applied both sides."""
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv_transpose2d(x, w, stride=1, padding=0, out_padding=0, groups=1):
    """NHWC transposed conv matching torch ConvTranspose2d geometry.

    torch output size: (in-1)*s - 2p + k + out_padding. Expressed via
    lax.conv_transpose with adjusted padding.
    """
    s = _pair(stride)
    p = _pair(padding)
    op = _pair(out_padding)
    kh, kw = w.shape[0], w.shape[1]
    pad = (
        (kh - 1 - p[0], kh - 1 - p[0] + op[0]),
        (kw - 1 - p[1], kw - 1 - p[1] + op[1]),
    )
    return jax.lax.conv_transpose(
        x,
        w.astype(x.dtype),
        strides=s,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        feature_group_count=groups,
    )


def max_pool2d(x, k, stride=None, padding=0):
    """NHWC max pool; pads with -inf like torch MaxPool2d."""
    k = _pair(k)
    s = _pair(stride if stride is not None else k)
    p = _pair(padding)
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )


def avg_pool2d(x, k, stride=None, padding=0, count_include_pad=True):
    """NHWC average pool; torch default counts zero-padding in the divisor."""
    k = _pair(k)
    s = _pair(stride if stride is not None else k)
    p = _pair(padding)
    summed = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    if count_include_pad:
        return summed / (k[0] * k[1])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)),
    )
    return summed / counts


def adaptive_avg_pool_hw(x, out_h=None, out_w=None):
    """AdaptiveAvgPool2d((out_h, out_w)) for the cases the reference uses:
    (1,1) global, (None,1) pool width only, (1,None) pool height only."""
    if out_h == 1 and out_w == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if out_w == 1 and out_h is None:
        return jnp.mean(x, axis=2, keepdims=True)
    if out_h == 1 and out_w is None:
        return jnp.mean(x, axis=1, keepdims=True)
    raise NotImplementedError((out_h, out_w))


def upsample_nearest(x, scale=2):
    """Nearest-neighbor upsample on NHWC (reference: nn.Upsample(None, 2, 'nearest'))."""
    s = int(scale)
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
    return x.reshape(b, h * s, w * s, c)


def channel_shuffle(x, groups):
    """ShuffleNet channel shuffle on NHWC (reference: models/common.py:1774)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def space_to_depth(x, s=2):
    """Contract: (b, h, w, c) -> (b, h/s, w/s, c*s*s) matching the reference's
    channel ordering (models/common.py:495-509: out channel = (sh*s+sw)*c + c_idx)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h/s, w/s, sh, sw, c
    return x.reshape(b, h // s, w // s, s * s * c)


def depth_to_space(x, s=2):
    """Expand: inverse of space_to_depth (models/common.py:513-527)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, s, s, c // (s * s))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * s, w * s, c // (s * s))


def focus_slice(x):
    """Focus: concat of 2x2 strided slices in the reference's channel order
    (models/common.py:375-383: TL, BL, TR, BR of each 2x2 block)."""
    return jnp.concatenate(
        [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
        axis=-1,
    )


# ---------------- activations ----------------


def silu(x):
    return x * jax.nn.sigmoid(x)


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.clip(x, 0, 6)


def hsigmoid(x):
    """h_sigmoid = ReLU6(x + 3) / 6 (reference: models/common.py:1565)."""
    return relu6(x + 3) / 6


def hswish(x):
    """h_swish = x * h_sigmoid(x) (reference: models/common.py:1574; same as
    torch nn.Hardswish)."""
    return x * hsigmoid(x)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


ACTIVATIONS = {
    "silu": silu,
    "relu": relu,
    "relu6": relu6,
    "hswish": hswish,
    "hardswish": hswish,
    "hsigmoid": hsigmoid,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
    "": lambda x: x,
}


# Config-wide default for act=True, set by the builder at trace time when a
# model YAML carries an ``activation:`` override (reference sets
# Conv.default_act globally, models/yolo.py:400-402). Traced functions bake
# this in as a constant; it never varies within one model.
DEFAULT_ACT = "silu"


def get_activation(act):
    """Resolve an activation spec: True->config default (silu unless the model
    YAML overrides), False/None->identity, str->named, 'leaky_relu:0.1' ->
    leaky with slope. Callables pass through."""
    if act is True:
        return get_activation(DEFAULT_ACT)
    if act in (False, None):
        return ACTIVATIONS["identity"]
    if callable(act):
        return act
    if isinstance(act, str):
        a = act.lower()
        if a.startswith("leaky_relu"):
            slope = float(a.split(":")[1]) if ":" in a else 0.01
            return lambda x: leaky_relu(x, slope)
        if a in ACTIVATIONS:
            return ACTIVATIONS[a]
    raise ValueError(f"unknown activation {act!r}")


# ---------------- init helpers (torch Conv2d defaults) ----------------


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt5) == U(±1/sqrt(fan_in)),
    fan_in = kh*kw*cin_per_group. Shape is HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default on (in, out)-shaped flax kernels."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
