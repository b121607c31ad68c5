"""Ablation backbone blocks: MobileNetV3, ShuffleNetV2, GhostNet, EfficientNet.

Capability parity with reference models/common.py:1699-2124 — the alternative
backbones of the paper's backbone-comparison table (README.md:102-109). NHWC
flax modules following the same conventions as layers.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import SeBlock
from .functional import channel_shuffle, hswish, max_pool2d, relu6
from .layers import BatchNorm, Conv, Conv2d


class Conv_BN_HSwish(nn.Module):
    """3x3/s conv + BN + hardswish (MobileNetV3 stem; reference
    models/common.py:1699-1708)."""

    c2: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, 3, self.stride, 1, name="conv")(x)
        y = BatchNorm(name="bn")(y, train)
        return hswish(y)


class MobileNetV3_InvertedResidual(nn.Module):
    """MobileNetV3 inverted residual (reference models/common.py:1710-1767)."""

    oup: int
    hidden_dim: int
    kernel_size: int = 3
    stride: int = 1
    use_se: bool = False
    use_hs: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        act = hswish if self.use_hs else (lambda v: jnp.maximum(v, 0))
        k, s, hd = self.kernel_size, self.stride, self.hidden_dim
        identity = (s == 1) and (inp == self.oup)
        if inp == hd:
            y = Conv2d(hd, k, s, (k - 1) // 2, g=hd, name="dw")(x)
            y = BatchNorm(name="dw_bn")(y, train)
            y = act(y)
            if self.use_se:
                y = SeBlock(4, name="se")(y, train)
            y = Conv2d(self.oup, 1, 1, 0, name="pw")(y)
            y = BatchNorm(name="pw_bn")(y, train)
        else:
            y = Conv2d(hd, 1, 1, 0, name="exp")(x)
            y = BatchNorm(name="exp_bn")(y, train)
            y = act(y)
            y = Conv2d(hd, k, s, (k - 1) // 2, g=hd, name="dw")(y)
            y = BatchNorm(name="dw_bn")(y, train)
            if self.use_se:
                y = SeBlock(4, name="se")(y, train)
            y = act(y)
            y = Conv2d(self.oup, 1, 1, 0, name="pw")(y)
            y = BatchNorm(name="pw_bn")(y, train)
        return x + y if identity else y


class CBRM(nn.Module):
    """Conv-BN-ReLU-MaxPool stem (ShuffleNetV2; reference models/common.py:1784-1797)."""

    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, 3, 2, 1, name="conv")(x)
        y = BatchNorm(name="bn")(y, train)
        y = jnp.maximum(y, 0)
        return max_pool2d(y, 3, 2, 1)


class Shuffle_Block(nn.Module):
    """ShuffleNetV2 unit (reference models/common.py:1800-1873)."""

    c2: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        bf = self.c2 // 2  # branch_features
        s = self.stride
        assert s in (1, 2)

        def branch2(z):
            z = Conv2d(bf, 1, 1, 0, name="b2_pw1")(z)
            z = BatchNorm(name="b2_pw1_bn")(z, train)
            z = jnp.maximum(z, 0)
            z = Conv2d(bf, 3, s, 1, g=bf, name="b2_dw")(z)
            z = BatchNorm(name="b2_dw_bn")(z, train)
            z = Conv2d(bf, 1, 1, 0, name="b2_pw2")(z)
            z = BatchNorm(name="b2_pw2_bn")(z, train)
            return jnp.maximum(z, 0)

        if s == 1:
            assert c1 == bf * 2, "stride-1 Shuffle_Block requires c1 == c2"
            x1, x2 = x[..., :bf], x[..., bf:]
            out = jnp.concatenate([x1, branch2(x2)], axis=-1)
        else:
            b1 = Conv2d(c1, 3, s, 1, g=c1, name="b1_dw")(x)
            b1 = BatchNorm(name="b1_dw_bn")(b1, train)
            b1 = Conv2d(bf, 1, 1, 0, name="b1_pw")(b1)
            b1 = BatchNorm(name="b1_pw_bn")(b1, train)
            b1 = jnp.maximum(b1, 0)
            out = jnp.concatenate([b1, branch2(x)], axis=-1)
        return channel_shuffle(out, 2)


class G_bneck(nn.Module):
    """GhostNet bottleneck (reference models/common.py:1949-1979).
    YAML args order: [c2, midc, k, s, use_se]."""

    c2: int
    midc: int = 16
    k: int = 5
    s: int = 1
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import GhostConv  # local import to avoid cycle

        c1 = x.shape[-1]
        y = GhostConv(self.midc, 1, 1, name="conv_0")(x, train)
        if self.s == 2:
            y = Conv(self.midc, 3, 2, 1, g=self.midc, act=False, name="conv_1")(y, train)
        if self.use_se:
            y = SeBlock(4, name="conv_se")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="conv_3")(y, train)
        if c1 == self.c2 and self.s == 1:
            sc = x
        else:
            sc = Conv(c1, 3, self.s, 1, g=c1, act=False, name="shortcut_0")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, name="shortcut_1")(sc, train)
        return y + sc


class Stem(nn.Module):
    """EfficientNet stem: 3x3/s2 conv + BN + ReLU6 (reference models/common.py:2024-2033)."""

    c2: int
    act: Any = "relu6"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, 3, 2, 1, name="conv")(x)
        y = BatchNorm(name="bn")(y, train)
        return relu6(y)


class MBConvBlock(nn.Module):
    """EfficientNet MBConv (reference models/common.py:2036-2120).
    Note the reference gives these BNs momentum 0.01 (vs 0.03 elsewhere)."""

    final_oup: int
    k: int = 3
    s: int = 1
    expand_ratio: int = 1
    drop_connect_rate: float = 0.0
    has_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        oup = inp * self.expand_ratio
        identity = x
        y = x
        if self.expand_ratio != 1:
            y = Conv2d(oup, 1, 1, 0, name="expand_conv")(y)
            y = BatchNorm(momentum=0.01, name="bn0")(y, train)
            y = relu6(y)
        y = Conv2d(oup, self.k, self.s, (self.k - 1) // 2, g=oup, name="depthwise_conv")(y)
        y = BatchNorm(momentum=0.01, name="bn1")(y, train)
        y = relu6(y)
        if self.has_se:
            y = SeBlock(4, name="se")(y, train)
        y = Conv2d(self.final_oup, 1, 1, 0, name="project_conv")(y)
        y = BatchNorm(momentum=0.01, name="bn2")(y, train)
        if self.s == 1 and inp == self.final_oup:
            if self.drop_connect_rate and train:
                keep = 1.0 - self.drop_connect_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
                y = jnp.where(mask, y / keep, 0.0).astype(y.dtype)
            y = y + identity
        return y
