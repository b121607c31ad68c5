"""Core YOLOv5-family building blocks as NHWC flax modules.

Capability parity with reference models/common.py (Conv/C3/SPPF/... families),
built TPU-first: NHWC layout, fp32 params with compute in the input dtype
(bf16-friendly — weights are cast at use, no silent fp32 promotion), explicit
torch-default initializers for training parity, and a BatchNorm with exact
torch running-stat semantics (eps 1e-3, momentum 0.03, unbiased running var —
reference utils/torch_utils.py:212-221) plus an optional mesh axis for
cross-replica stats (the SyncBatchNorm equivalent, reference train.py:185-187).

Every block takes (x, train=False); BN running stats live in the
'batch_stats' flax collection.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .functional import (
    LazyConcat,
    autopad,
    conv2d,
    conv_transpose2d,
    depth_to_space,
    focus_slice,
    get_activation,
    lazy_cat,
    max_pool2d,
    space_to_depth,
    torch_conv_bias_init,
    torch_conv_kernel_init,
    torch_linear_kernel_init,
    upsample_nearest,
)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv2d(nn.Module):
    """Bare conv (torch nn.Conv2d equivalent): HWIO fp32 params, NHWC compute
    in the input dtype."""

    features: int
    k: Any = 1
    s: Any = 1
    p: Any = None  # None -> autopad(k, None, d)
    g: int = 1
    d: int = 1
    use_bias: bool = False
    g_dense: bool = False  # run a g=cin grouped conv as a masked-DENSE conv:
    # XLA's grouped-conv gradients are the slowest ops in the train step
    # (runs/input_wall/BWD_PROBE_r05.json: 6.4x bwd/fwd vs 1.5x for dense),
    # while a dense conv whose kernel is the grouped kernel scattered into a
    # block-diagonal (exact zeros elsewhere) is bit-identical (adding exact
    # zeros is exact) and its backward is the healthy dense path. The extra
    # FLOPs (x g) stay far under the MXU budget for these layers. Param shape
    # and tree are unchanged — checkpoints are compatible both ways.

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.k)
        if isinstance(x, LazyConcat) and self.g != 1:
            x = x.materialize()  # grouped kernels don't split along cin parts
        cin = x.shape[-1]
        w = self.param("kernel", torch_conv_kernel_init, (kh, kw, cin // self.g, self.features))
        pad = self.p if self.p is not None else autopad(self.k, None, self.d)
        if self.g > 1 and self.g_dense:
            if cin != self.g:
                raise ValueError("g_dense supports channel-multiplier grouped convs (cin == g)")
            co_group = jnp.arange(self.features) // (self.features // self.g)
            mask = (jnp.arange(cin)[:, None] == co_group[None, :]).astype(w.dtype)
            wd = w[:, :, 0, :][:, :, None, :] * mask[None, None]
            y = conv2d(x, wd, self.s, pad, 1, self.d)
        elif isinstance(x, LazyConcat):
            # conv(cat(parts)) == sum of convs with the kernel sliced along
            # cin — the concatenated tensor never hits HBM (see LazyConcat)
            y, off = None, 0
            for part in x.parts:
                cp = part.shape[-1]
                yi = conv2d(part, jax.lax.slice_in_dim(w, off, off + cp, axis=2), self.s, pad, 1, self.d)
                y = yi if y is None else y + yi
                off += cp
        else:
            y = conv2d(x, w, self.s, pad, self.g, self.d)
        if self.use_bias:
            fan_in = kh * kw * (cin // self.g)
            b = self.param("bias", torch_conv_bias_init(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Linear(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", torch_linear_kernel_init, (x.shape[-1], self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", torch_conv_bias_init(x.shape[-1]), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics.

    Train: normalize by biased batch var, update running stats with unbiased
    var using torch's momentum convention (new = (1-m)*old + m*batch).
    Eval: normalize by running stats. Stats math is fp32 regardless of the
    compute dtype. If ``axis_name`` is set and we're inside pmap/shard_map,
    batch stats are averaged across that axis (SyncBN-equivalent — reference
    train.py:185-187 — falling out of the data-parallel mesh for free).
    """

    momentum: float = 0.03
    eps: float = 1e-3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class Conv(nn.Module):
    """Conv2d + BN + activation (reference models/common.py:82-101), the
    workhorse block. ``fused=True`` folds BN away (bias conv + act) — the
    checkpoint fuser produces params for this variant."""

    c2: int
    k: Any = 1
    s: Any = 1
    p: Any = None
    g: int = 1
    d: int = 1
    act: Any = True
    fused: bool = False

    accepts_lazy_concat = True  # Conv2d splits its kernel along cin

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, self.k, self.s, self.p, self.g, self.d, use_bias=self.fused, name="conv")(x)
        if not self.fused:
            y = BatchNorm(name="bn")(y, train)
        return get_activation(self.act)(y)


class DWConv(nn.Module):
    """Depthwise conv block: groups = gcd(c1, c2) (reference models/common.py:105)."""

    c2: int
    k: Any = 1
    s: Any = 1
    d: int = 1
    act: Any = True
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, None, g, self.d, self.act, self.fused, name="dw")(x, train)


class DWConvTranspose2d(nn.Module):
    """Depthwise transposed conv (reference models/common.py:132)."""

    c2: int
    k: Any = 1
    s: Any = 1
    p1: int = 0
    p2: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        g = math.gcd(c1, self.c2)
        kh, kw = _pair(self.k)
        w = self.param("kernel", torch_conv_kernel_init, (kh, kw, c1 // g, self.c2))
        fan_in = kh * kw * (c1 // g)
        b = self.param("bias", torch_conv_bias_init(fan_in), (self.c2,))
        y = conv_transpose2d(x, w, self.s, self.p1, self.p2, groups=g)
        return y + b.astype(y.dtype)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference models/common.py:195)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck, v5-legacy variant (reference models/common.py:212)."""

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
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")(y1, train)
        y1 = Conv2d(c_, 1, 1, name="cv3")(y1)
        y2 = Conv2d(c_, 1, 1, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNorm(name="bn")(y, train)
        y = get_activation("silu")(y)
        return Conv(self.c2, 1, 1, name="cv4")(y, train)


class CrossConv(nn.Module):
    """Cross conv: (1,k) then (k,1) (reference models/common.py:236)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, (1, self.k), (1, self.s), name="cv1")(x, train)
        y = Conv(self.c2, (self.k, 1), (self.s, 1), g=self.g, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c2) else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference models/common.py:254-269)."""

    accepts_lazy_concat = True  # x only feeds cv1/cv2 (both Conv)

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def inner(self, c_, i):
        return Bottleneck(c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            y1 = self.inner(c_, i)(y1, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(lazy_cat([y1, y2]), train)


class C3x(C3):
    """C3 with CrossConv inner blocks (reference models/common.py:273)."""

    def inner(self, c_, i):
        return CrossConv(c_, 3, 1, self.g, 1.0, self.shortcut, name=f"m_{i}")


class SPP(nn.Module):
    """Spatial pyramid pooling (reference models/common.py:321)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        pooled = [y] + [max_pool2d(y, k, 1, k // 2) for k in self.k]
        return Conv(self.c2, 1, 1, name="cv2")(lazy_cat(pooled), train)


class SPPF(nn.Module):
    """Fast SPP: serial k-pool x3 + concat (reference models/common.py:348-367)."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, name="cv1")(x, train)
        y1 = max_pool2d(y, self.k, 1, self.k // 2)
        y2 = max_pool2d(y1, self.k, 1, self.k // 2)
        y3 = max_pool2d(y2, self.k, 1, self.k // 2)
        return Conv(self.c2, 1, 1, name="cv2")(lazy_cat([y, y1, y2, y3]), train)


class Focus(nn.Module):
    """Space-to-channel focus (reference models/common.py:375-383)."""

    c2: int
    k: Any = 1
    s: Any = 1
    p: Any = None
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(self.c2, self.k, self.s, self.p, self.g, act=self.act, name="conv")(focus_slice(x), train)


class GhostConv(nn.Module):
    """Ghost conv: half real, half cheap 5x5 depthwise (reference models/common.py:433)."""

    c2: int
    k: Any = 1
    s: Any = 1
    g: int = 1
    act: Any = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference models/common.py:474)."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, name="conv_0")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, name="conv_1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="conv_2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, name="shortcut_0")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottleneck inner blocks (reference models/common.py:309)."""

    def inner(self, c_, i):
        return GhostBottleneck(c_, name=f"m_{i}")


class C3SPP(nn.Module):
    accepts_lazy_concat = True  # x only feeds cv1/cv2 (both Conv)
    """C3 with an SPP inner block (reference models/common.py:297)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, name="cv1")(x, train)
        y1 = SPP(c_, self.k, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(lazy_cat([y1, y2]), train)


class TransformerLayer(nn.Module):
    """LayerNorm-free transformer layer (reference models/common.py:143).

    Input (B, N, C). Mirrors the reference's double projection: explicit
    q/k/v linears (no bias) feeding a standard MHA (with in/out projections
    and biases), then a 2-linear FFN, both with residuals.
    """

    c: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, h = self.c, self.num_heads
        q = Linear(c, use_bias=False, name="q")(x)
        k = Linear(c, use_bias=False, name="k")(x)
        v = Linear(c, use_bias=False, name="v")(x)
        # MHA internal projections (torch nn.MultiheadAttention)
        q = Linear(c, name="ma_q")(q)
        k = Linear(c, name="ma_k")(k)
        v = Linear(c, name="ma_v")(v)
        b, n, _ = q.shape
        d = c // h
        qh = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / math.sqrt(d), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = Linear(c, name="ma_out")(out) + x
        return Linear(c, use_bias=False, name="fc2")(Linear(c, use_bias=False, name="fc1")(x)) + x


class TransformerBlock(nn.Module):
    """ViT-style block over flattened spatial positions (reference models/common.py:168)."""

    c2: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + Linear(c, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(c, self.num_heads, name=f"tr_{i}")(p, train)
        return p.reshape(b, h, w, c)


class C3TR(nn.Module):
    accepts_lazy_concat = True  # x only feeds cv1/cv2 (both Conv)
    """C3 with a TransformerBlock inner (reference models/common.py:285)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, name="cv1")(x, train)
        y1 = TransformerBlock(c_, 4, self.n, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, name="cv2")(x, train)
        return Conv(self.c2, 1, name="cv3")(lazy_cat([y1, y2]), train)


class Contract(nn.Module):
    """Space-to-depth by gain (reference models/common.py:495)."""

    gain: int = 2

    def __call__(self, x, train: bool = False):
        return space_to_depth(x, self.gain)


class Expand(nn.Module):
    """Depth-to-space by gain (reference models/common.py:513)."""

    gain: int = 2

    def __call__(self, x, train: bool = False):
        return depth_to_space(x, self.gain)


class Concat(nn.Module):
    """Channel concat of a list of feature maps (reference models/common.py:531).
    The reference's dim=1 (NCHW channels) maps to axis=-1 in NHWC."""

    d: int = 1

    def __call__(self, xs, train: bool = False):
        axis = -1 if self.d == 1 else self.d
        if axis == -1:
            # deferred: split-capable consumers (Conv/C3*) never materialize
            # it; the graph executor materializes for everyone else
            return lazy_cat(xs)
        return jnp.concatenate(xs, axis=axis)


class Upsample(nn.Module):
    """nn.Upsample(None, scale, 'nearest') equivalent."""

    size: Any = None
    scale_factor: int = 2
    mode: str = "nearest"

    def __call__(self, x, train: bool = False):
        assert self.mode == "nearest", "only nearest upsampling is used by the reference configs"
        return upsample_nearest(x, self.scale_factor)


class MaxPool2dLayer(nn.Module):
    """nn.MaxPool2d equivalent for YAML graphs (yolov3-tiny uses it)."""

    k: int
    s: Any = None
    p: int = 0

    def __call__(self, x, train: bool = False):
        return max_pool2d(x, self.k, self.s, self.p)


class ZeroPad2dLayer(nn.Module):
    """nn.ZeroPad2d equivalent; padding (left, right, top, bottom)."""

    padding: Tuple[int, int, int, int]

    def __call__(self, x, train: bool = False):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class MixConv2d(nn.Module):
    """Mixed depthwise kernel sizes (reference models/experimental.py:35),
    equal-channel split strategy."""

    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.k)
        splits = [self.c2 // n + (1 if i < self.c2 % n else 0) for i in range(n)]
        ys = [
            Conv2d(c, k, self.s, name=f"m_{i}")(x)
            for i, (c, k) in enumerate(zip(splits, self.k))
        ]
        y = jnp.concatenate(ys, axis=-1)
        y = BatchNorm(name="bn")(y, train)
        return get_activation("silu")(y)


class Sum(nn.Module):
    """(Weighted) sum of inputs (reference models/experimental.py:14)."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if self.weight:
            w = self.param("w", lambda k, s: -jnp.arange(1.0, s[0] + 1.0) / 2, (self.n - 1,))
            w = jax.nn.sigmoid(w) * 2
            y = xs[0]
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i].astype(xs[0].dtype)
            return y
        y = xs[0]
        for z in xs[1:]:
            y = y + z
        return y


class BiFPN_Add2(nn.Module):
    """Learned-weight 2-input fusion (reference models/common.py:1642)."""

    c2: int
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, xs, train: bool = False):
        w = self.param("w", nn.initializers.ones, (2,), jnp.float32)
        wn = w / (jnp.sum(w) + self.epsilon)
        y = wn[0] * xs[0].astype(jnp.float32) + wn[1] * xs[1].astype(jnp.float32)
        y = get_activation("silu")(y).astype(xs[0].dtype)
        return Conv2d(self.c2, 1, 1, use_bias=True, name="conv")(y)


class BiFPN_Add3(nn.Module):
    """Learned-weight 3-input fusion (reference models/common.py:1661)."""

    c2: int
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, xs, train: bool = False):
        w = self.param("w", nn.initializers.ones, (3,), jnp.float32)
        wn = w / (jnp.sum(w) + self.epsilon)
        y = wn[0] * xs[0].astype(jnp.float32) + wn[1] * xs[1].astype(jnp.float32) + wn[2] * xs[2].astype(jnp.float32)
        y = get_activation("silu")(y).astype(xs[0].dtype)
        return Conv2d(self.c2, 1, 1, use_bias=True, name="conv")(y)
