"""FasterNet partial-convolution backbone blocks (LEAD-YOLO's backbone).

Capability parity with reference models/common.py:1411-1561 (arXiv 2303.03667
"Run, Don't Walk"), NHWC/TPU-first:

- PartialConv3 runs a 3x3 conv on the first ``dim/n_div`` channels and passes
  the rest through. In NHWC this is a channel slice + concat, which XLA fuses;
  no clone/in-place dance needed.
- MLPBlock = PConv spatial mixing -> 1x1 expand (BN+ReLU) -> 1x1 project,
  residual from the ORIGINAL input, optional LayerScale and DropPath
  (the shipped configs use drop_path=0, layer_scale=0).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv2d
from .functional import get_activation


class PartialConv3(nn.Module):
    """Conv3x3 on the first c1/n_div channels only (reference
    models/common.py:1411-1437; split_cat and slicing forwards are
    mathematically identical — one implementation suffices)."""

    c1: int
    n_div: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_conv3 = self.c1 // self.n_div
        x1 = x[..., :dim_conv3]
        x2 = x[..., dim_conv3:]
        x1 = Conv2d(dim_conv3, 3, 1, 1, name="partial_conv3")(x1)
        return jnp.concatenate([x1, x2], axis=-1)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath equivalent; reference
    models/common.py:1408 imports it from timm)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class MLPBlock(nn.Module):
    """PConv + 2-layer 1x1 MLP with residual (reference models/common.py:1441-1489)."""

    dim: int
    n_div: int = 4
    mlp_ratio: float = 2.0
    drop_path: float = 0.0
    layer_scale_init_value: float = 0.0
    act: Any = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = PartialConv3(self.dim, self.n_div, name="spatial_mixing")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        y = Conv2d(hidden, 1, use_bias=False, name="mlp_0")(y)
        y = BatchNorm(name="mlp_1")(y, train)
        y = get_activation(self.act)(y)
        y = Conv2d(self.dim, 1, use_bias=False, name="mlp_3")(y)
        if self.layer_scale_init_value > 0:
            ls = self.param(
                "layer_scale",
                lambda k, s: jnp.full(s, self.layer_scale_init_value, jnp.float32),
                (self.dim,),
            )
            y = y * ls.astype(y.dtype)
        y = DropPath(self.drop_path, name="drop_path")(y, train)
        return shortcut + y


class BasicStage(nn.Module):
    """depth x MLPBlock (reference models/common.py:1493-1525). Output
    channels == input channels (the builder pops the YAML c2 arg, reference
    models/yolo.py:470-471)."""

    dim: int
    depth: int = 1
    n_div: int = 4
    mlp_ratio: float = 2.0
    act: Any = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = MLPBlock(self.dim, self.n_div, self.mlp_ratio, act=self.act, name=f"blocks_{i}")(x, train)
        return x


class PatchEmbedFasterNet(nn.Module):
    """Patch embedding: k=patch_size, s=patch_stride conv (no pad) + BN
    (reference models/common.py:1528-1543)."""

    embed_dim: int
    patch_size: int = 4
    patch_stride: int = 4
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.embed_dim, self.patch_size, self.patch_stride, 0, use_bias=self.fused, name="proj")(x)
        if not self.fused:
            y = BatchNorm(name="norm")(y, train)
        return y


class PatchMergingFasterNet(nn.Module):
    """Downsampling merge: k x k, stride s conv + BN (reference
    models/common.py:1546-1561)."""

    out_dim: int
    k: int = 2
    patch_stride2: int = 2
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.out_dim, self.k, self.patch_stride2, 0, use_bias=self.fused, name="reduction")(x)
        if not self.fused:
            y = BatchNorm(name="norm")(y, train)
        return y
