"""Channel-pruned block variants + pruning utilities.

Capability parity with reference models/pruned_common.py:30-69
(BottleneckPruned/C3Pruned/SPPFPruned), utils/prune_utils.py (BN-gamma
gathering + threshold masks) and utils/torch_utils.py:238-245 (unstructured L1
prune). Functional versions: pruning produces (a) sparsity masks applied to
params, or (b) per-block channel plans for the pruned block classes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import Conv
from ..nn.functional import max_pool2d


class BottleneckPruned(nn.Module):
    """Bottleneck with independent inner width (reference models/pruned_common.py:30)."""

    cv1out: int
    cv2out: int
    shortcut: bool = True
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.cv1out, 1, 1, name="cv1")(x, train)
        y = Conv(self.cv2out, 3, 1, g=self.g, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.cv2out) else y


class C3Pruned(nn.Module):
    """C3 with per-branch pruned widths (reference models/pruned_common.py:41)."""

    cv1out: int
    cv2out: int
    cv3out: int
    inner: Tuple[Tuple[int, int], ...] = ()  # (cv1out, cv2out) per bottleneck
    shortcut: bool = True
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = Conv(self.cv1out, 1, 1, name="cv1")(x, train)
        for i, (c1o, c2o) in enumerate(self.inner):
            y1 = BottleneckPruned(c1o, c2o, self.shortcut, self.g, name=f"m_{i}")(y1, train)
        y2 = Conv(self.cv2out, 1, 1, name="cv2")(x, train)
        return Conv(self.cv3out, 1, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class SPPFPruned(nn.Module):
    """SPPF with pruned hidden width (reference models/pruned_common.py:58)."""

    cv1out: int
    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.cv1out, 1, 1, name="cv1")(x, train)
        y1 = max_pool2d(y, self.k, 1, self.k // 2)
        y2 = max_pool2d(y1, self.k, 1, self.k // 2)
        y3 = max_pool2d(y2, self.k, 1, self.k // 2)
        return Conv(self.c2, 1, 1, name="cv2")(jnp.concatenate([y, y1, y2, y3], axis=-1), train)


# ---------------- pruning analysis / application ----------------


def gather_bn_weights(variables) -> np.ndarray:
    """All BN scale magnitudes, flattened (reference utils/prune_utils.py
    gather_bn_weights)."""
    out = []

    def visit(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        parent = str(path[-2].key) if len(path) > 1 and hasattr(path[-2], "key") else ""
        if name == "scale":
            out.append(np.abs(np.asarray(leaf)).ravel())
        return leaf

    jax.tree_util.tree_map_with_path(visit, variables["params"])
    return np.concatenate(out) if out else np.zeros(0)


def bn_prune_threshold(variables, percent: float) -> float:
    """Global gamma threshold for a target channel-prune fraction."""
    w = np.sort(gather_bn_weights(variables))
    if not len(w):
        return 0.0
    return float(w[int(np.clip(percent, 0, 0.999) * len(w))])


def bn_channel_masks(variables, threshold: float):
    """Per-BN keep masks (gamma > threshold), keyed by param path."""
    masks = {}

    def visit(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale":
            key = "/".join(str(getattr(p, "key", p)) for p in path[:-1])
            masks[key] = np.abs(np.asarray(leaf)) > threshold
        return leaf

    jax.tree_util.tree_map_with_path(visit, variables["params"])
    return masks


def l1_unstructured_prune(params, amount: float = 0.3):
    """Zero the smallest-|w| fraction of every conv kernel
    (reference utils/torch_utils.py:238-245 prune())."""

    def prune_leaf(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 2:
            a = np.asarray(leaf)
            k = int(amount * a.size)
            if k:
                thr = np.partition(np.abs(a).ravel(), k)[k]
                return jnp.asarray(np.where(np.abs(a) < thr, 0.0, a))
        return leaf

    return jax.tree_util.tree_map_with_path(prune_leaf, params)


def sparsity(params) -> float:
    """Global fraction of zero weights (reference utils/torch_utils.py:232)."""
    total = nz = 0
    for leaf in jax.tree.leaves(params):
        a = np.asarray(leaf)
        total += a.size
        nz += (a == 0).sum()
    return nz / max(total, 1)
