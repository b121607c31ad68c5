"""Receptive-field attention convs: RFAConv, RFCAConv, RFCBAMConv (LEAD-YOLO).

Capability parity with reference models/rfa.py (arXiv 2304.03198), re-derived
for TPU instead of translated:

The reference materializes a (B, C, H*k, W*k) "unfolded" feature map with an
einops rearrange and then runs a stride-k conv over it (models/rfa.py:121-129).
That k^2-expanded, C-channel tensor is the memory hog SURVEY.md §7 flags. But
the stride-k conv over the expanded layout touches each k-block exactly once,
so it is algebraically a single contraction over (k^2, C):

    out[b,h,w,o] = sum_{t,c} W[t,c,o] * feat[b,h,w,c,t] * attn[...]

which XLA maps straight onto the MXU as one big matmul. We therefore keep the
generated features in their compact (B, H, W, C, k^2) form end-to-end and only
spatially expand the *attention* maps (1-2 channels — cheap) where the
reference's 3x3 spatial-attention conv genuinely crosses k-block boundaries.
Numerics are bit-identical to the expand-then-conv formulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import fused_kernels_enabled
from .attention import SE
from .functional import avg_pool2d, hswish, torch_conv_bias_init, torch_conv_kernel_init
from .layers import BatchNorm, Conv2d


def _generate_features(x, k, s, c, name_prefix, parent, train):
    """Grouped conv C->C*k^2 (+BN+ReLU) producing per-tap receptive-field
    features, reshaped to (B, H', W', C, k^2). Channel layout matches torch's
    group-major view(b, c, k^2, h, w) (reference models/rfa.py:101-106,119).

    Train uses the masked-dense formulation (Conv2d.g_dense): XLA's
    grouped-conv backward is 6.4x its forward on v5e while the bit-identical
    block-diagonal dense conv's is 2.1x (BWD_PROBE_r05.json — the single
    largest train-step cost found by the r05 backward attribution); eval
    keeps the grouped kernel, whose forward is the faster of the two."""
    from ..utils import dense_grad_enabled

    y = Conv2d(c * k * k, k, s, k // 2, g=c,
               g_dense=bool(train) and k > 1 and dense_grad_enabled(),
               name=f"{name_prefix}_conv")(x)
    y = BatchNorm(name=f"{name_prefix}_bn")(y, train)
    y = jnp.maximum(y, 0)
    b, h, w, _ = y.shape
    return y.reshape(b, h, w, c, k * k)


def _tap_contract(feat, k, c_out, name, module, use_bias=True):
    """The fused stride-k conv: contract (k^2, C) -> c_out on the MXU.

    Weight stored as (k^2, C, c_out), initialized exactly like the torch
    Conv2d(C, c_out, k, stride=k) it replaces (fan_in = C*k*k).
    """
    c = feat.shape[3]
    w = module.param(f"{name}_kernel", torch_conv_kernel_init, (k * k, c, c_out))
    # Contract as ONE flattened matmul instead of a two-axis einsum: identical
    # math and identical MXU mapping, but the (c,t)-vs-(t,c) axis collapse is
    # explicit — the TFLite converter miscompiles dot_general with two
    # contraction dimensions (scrambled P4/P5 heads, mAP 0.658 -> 0.53),
    # while a plain matmul lowers to a clean FULLY_CONNECTED.
    bb, hh, ww = feat.shape[:3]
    w2 = w.astype(feat.dtype).transpose(1, 0, 2).reshape(c * k * k, c_out)  # (c*t, o)
    out = jax.lax.dot(
        feat.reshape(bb * hh * ww, c * k * k), w2, preferred_element_type=jnp.float32
    ).reshape(bb, hh, ww, c_out).astype(feat.dtype)
    if use_bias:
        b = module.param(f"{name}_bias", torch_conv_bias_init(c * k * k), (c_out,))
        out = out + b.astype(out.dtype)
    return out


class RFAConv(nn.Module):
    """Receptive-field attention conv, group-conv formulation
    (reference models/rfa.py:12-41): per-tap softmax weights from an
    avg-pool + grouped 1x1, applied to generated per-tap features."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = self.k
        pooled = avg_pool2d(x, k, self.s, k // 2)
        wgt = Conv2d(c * k * k, 1, 1, 0, g=c, name="get_weight_conv")(pooled)
        b, h, w, _ = wgt.shape
        wgt = jax.nn.softmax(wgt.reshape(b, h, w, c, k * k), axis=-1)
        feat = _generate_features(x, k, self.s, c, "generate", self, train)
        out = _tap_contract(feat * wgt, k, self.c2, "conv", self, use_bias=True)
        out = BatchNorm(name="conv_bn")(out, train)
        return jnp.maximum(out, 0)


class RFCBAMConv(nn.Module):
    """Receptive-field CBAM conv — THE LEAD-YOLO head block
    (reference models/rfa.py:95-129): SE channel gate x spatial max/mean 3x3
    sigmoid gate over the per-tap features, then the fused stride-k contraction."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = self.k
        ch_attn = SE(16, name="se")(x, train)  # (B,1,1,C)

        feat = _generate_features(x, k, self.s, c, "generate", self, train)
        b, h, w, _, _ = feat.shape

        # Spatial attention needs the true expanded (H*k, W*k) arrangement
        # because its 3x3 conv crosses k-block boundaries — but only on the
        # 2-channel max/mean map, never on the C-channel features.
        mx = jnp.max(feat, axis=3)  # (B,H,W,k^2)
        mn = jnp.mean(feat, axis=3)
        sp = jnp.stack([mx, mn], axis=-1)  # (B,H,W,k^2,2)
        sp = sp.reshape(b, h, w, k, k, 2).transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, 2)
        sp = Conv2d(1, 3, 1, 1, name="get_weight_conv")(sp)
        rf_attn = jax.nn.sigmoid(sp)  # (B,Hk,Wk,1)
        rf_attn = (
            rf_attn.reshape(b, h, k, w, k).transpose(0, 1, 3, 2, 4).reshape(b, h, w, 1, k * k)
        )

        # Fused Pallas inference tail: gate + tap contraction + folded BN/ReLU
        # in one VMEM pass (nn/pallas_gated_contract.py) — XLA materializes
        # the gated tensor because it will not fuse elementwise producers into
        # a dot operand. Training and init keep the autodiff-friendly XLA form
        # below; both share the exact same parameter tree.
        if not train and not self.is_initializing() and fused_kernels_enabled():
            import jax as _jax

            from .pallas_gated_contract import gated_tap_contract, supports

            if supports(feat.shape, self.c2):
                v = self.variables
                p, bs = v["params"], v["batch_stats"]
                return gated_tap_contract(
                    feat, rf_attn, ch_attn,
                    p["conv_kernel"], p["conv_bias"],
                    p["conv_bn"]["scale"], p["conv_bn"]["bias"],
                    bs["conv_bn"]["mean"], bs["conv_bn"]["var"],
                    interpret=_jax.default_backend() != "tpu",
                )

        gated = feat * ch_attn[..., None] * rf_attn
        out = _tap_contract(gated, k, self.c2, "conv", self, use_bias=True)
        out = BatchNorm(name="conv_bn")(out, train)
        return jnp.maximum(out, 0)


class RFCAConv(nn.Module):
    """Receptive-field coordinate-attention conv (reference models/rfa.py:151-196):
    CoordAtt computed over the expanded strip, applied per (axis, tap)."""

    c2: int
    k: int = 3
    s: int = 1
    reduction: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = self.k
        feat = _generate_features(x, k, self.s, c, "generate", self, train)
        b, h, w, _, _ = feat.shape
        fv = feat.reshape(b, h, w, c, k, k)  # taps t = n1*k + n2

        # pool over expanded W -> strip of length H*k; over expanded H -> W*k
        x_h = jnp.mean(fv, axis=(2, 5)).transpose(0, 1, 3, 2).reshape(b, h * k, c)  # (B,Hk,C)
        x_w = jnp.mean(fv, axis=(1, 4)).transpose(0, 1, 3, 2).reshape(b, w * k, c)  # (B,Wk,C)
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]
        mip = max(8, c // self.reduction)
        y = Conv2d(mip, 1, use_bias=True, name="conv1")(y)
        y = BatchNorm(name="bn1")(y, train)
        y = hswish(y)
        y_h, y_w = y[:, : h * k], y[:, h * k :]
        a_h = jax.nn.sigmoid(Conv2d(c, 1, use_bias=True, name="conv_h")(y_h))  # (B,Hk,1,C)
        a_w = jax.nn.sigmoid(Conv2d(c, 1, use_bias=True, name="conv_w")(y_w))  # (B,Wk,1,C)
        a_h = a_h.reshape(b, h, k, c)
        a_w = a_w.reshape(b, w, k, c)

        # attn[b,h,w,c,n1,n2] = a_h[b,h,n1,c] * a_w[b,w,n2,c]
        ah = a_h.transpose(0, 1, 3, 2)[:, :, None, :, :, None]  # (B,H,1,C,k,1)
        aw = a_w.transpose(0, 1, 3, 2)[:, None, :, :, None, :]  # (B,1,W,C,1,k)
        gated = (fv * ah * aw).reshape(b, h, w, c, k * k)
        return _tap_contract(gated, k, self.c2, "conv", self, use_bias=True)
