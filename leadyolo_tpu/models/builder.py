"""Config-driven model builder: YAML graph spec -> flax module graph.

Capability parity with reference models/yolo.py:397-492 (parse_model), minus
the eval(): module names resolve through an explicit registry (SURVEY.md §5
flags the reference's eval() as something our build must not replicate), and
argument strings resolve through a small safe-literal table.

The YAML dialect is the reference's: ``{nc, depth_multiple, width_multiple,
anchors, activation?, backbone, head}`` with rows ``[from, number, module,
args]``, so a user's existing model YAMLs load unchanged (including the
``nn.Upsample``-style torch aliases).
"""
from __future__ import annotations

import math
from typing import Any, Tuple

from flax import linen as nn

from ..nn import (
    BatchNorm,
    BiFPN_Add2,
    BiFPN_Add3,
    Bottleneck,
    BottleneckCSP,
    C3,
    C3Ghost,
    C3SPP,
    C3TR,
    C3x,
    C3_CA,
    CBRM,
    Concat,
    Conv,
    Conv_BN_HSwish,
    Contract,
    CrossConv,
    DWConv,
    DWConvTranspose2d,
    Expand,
    Focus,
    G_bneck,
    GhostBottleneck,
    GhostConv,
    MBConvBlock,
    MaxPool2dLayer,
    MixConv2d,
    MobileNetV3_InvertedResidual,
    BasicStage,
    PatchEmbedFasterNet,
    PatchMergingFasterNet,
    RFAConv,
    RFCAConv,
    RFCBAMConv,
    SPP,
    SPPF,
    Shuffle_Block,
    Stem,
    Upsample,
    ZeroPad2dLayer,
)
from .heads import Detect, Segment, Classify
from ..nn.extra import iRMB


def make_divisible(x, divisor=8):
    """Round channel counts up to a hardware-friendly multiple
    (reference utils/general.py make_divisible)."""
    return math.ceil(x / divisor) * divisor


class Stack(nn.Module):
    """n sequential copies of a block (the reference wraps repeats in
    nn.Sequential, models/yolo.py:479)."""

    layers: Tuple[nn.Module, ...]

    def __call__(self, x, train: bool = False):
        for m in self.layers:
            x = m(x, train=train)
        return x


class BatchNormLayer(nn.Module):
    """Standalone nn.BatchNorm2d graph node."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return BatchNorm(name="bn")(x, train)


# Activation aliases for the YAML ``activation:`` key (reference sets
# Conv.default_act globally, models/yolo.py:400-402).
_ACT_ALIASES = {
    "nn.SiLU()": "silu",
    "nn.ReLU()": "relu",
    "nn.ReLU6()": "relu6",
    "nn.Hardswish()": "hardswish",
    "nn.LeakyReLU(0.1)": "leaky_relu:0.1",
    "nn.LeakyReLU(0.01)": "leaky_relu:0.01",
}


def _resolve_act(spec):
    if spec is None:
        return None
    spec = str(spec).strip()
    if spec in _ACT_ALIASES:
        return _ACT_ALIASES[spec]
    if spec.startswith("nn.LeakyReLU(") and spec.endswith(")"):
        return f"leaky_relu:{float(spec[13:-1])}"
    return spec  # assume it's already one of our activation names


def _resolve_arg(a, names):
    """Safe literal resolution for YAML arg strings (no eval)."""
    if isinstance(a, str):
        if a in names:
            return names[a]
        low = a.strip()
        if low == "None":
            return None
        if low in ("True", "False"):
            return low == "True"
        try:
            return int(low)
        except ValueError:
            pass
        try:
            return float(low)
        except ValueError:
            pass
        return a  # plain string like 'nearest' / 'ReLU6'
    return a


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


# Channel-taking module factories: signature (c1, c2, *rest) like the
# reference registry set (models/yolo.py:434-444). ``act`` is the config-wide
# default activation for Conv-like blocks.
def _build_ch_module(name, c1, c2, rest, n, act):
    if name == "Conv":
        k = rest[0] if len(rest) > 0 else 1
        s = rest[1] if len(rest) > 1 else 1
        p = rest[2] if len(rest) > 2 else None
        g = rest[3] if len(rest) > 3 else 1
        d = rest[4] if len(rest) > 4 else 1
        return Conv(c2, _tuplify(k), _tuplify(s), _tuplify(p), g, d, act=act or True), c2
    if name == "DWConv":
        k = rest[0] if len(rest) > 0 else 1
        s = rest[1] if len(rest) > 1 else 1
        d = rest[2] if len(rest) > 2 else 1
        return DWConv(c2, k, s, d, act=act or True), c2
    if name == "DWConvTranspose2d":
        k, s, p1, p2 = (rest + [1, 1, 0, 0])[:4]
        return DWConvTranspose2d(c2, k, s, p1, p2), c2
    if name == "GhostConv":
        k = rest[0] if len(rest) > 0 else 1
        s = rest[1] if len(rest) > 1 else 1
        g = rest[2] if len(rest) > 2 else 1
        return GhostConv(c2, k, s, g, act=act or True), c2
    if name == "Bottleneck":
        sc = rest[0] if len(rest) > 0 else True
        g = rest[1] if len(rest) > 1 else 1
        e = rest[2] if len(rest) > 2 else 0.5
        return Bottleneck(c2, sc, g, e), c2
    if name == "GhostBottleneck":
        k = rest[0] if len(rest) > 0 else 3
        s = rest[1] if len(rest) > 1 else 1
        return GhostBottleneck(c2, k, s), c2
    if name == "SPP":
        k = tuple(rest[0]) if rest else (5, 9, 13)
        return SPP(c2, k), c2
    if name == "SPPF":
        k = rest[0] if rest else 5
        return SPPF(c2, k), c2
    if name == "Focus":
        k = rest[0] if len(rest) > 0 else 1
        s = rest[1] if len(rest) > 1 else 1
        return Focus(c2, k, s, act=act or True), c2
    if name == "CrossConv":
        k, s, g, e, sc = (rest + [3, 1, 1, 1.0, False])[:5]
        return CrossConv(c2, k, s, g, e, sc), c2
    if name == "MixConv2d":
        k = tuple(rest[0]) if len(rest) > 0 else (1, 3)
        s = rest[1] if len(rest) > 1 else 1
        return MixConv2d(c2, k, s), c2
    if name in ("BottleneckCSP", "C3", "C3x", "C3TR", "C3Ghost", "C3_CA"):
        cls = {"BottleneckCSP": BottleneckCSP, "C3": C3, "C3x": C3x, "C3TR": C3TR, "C3Ghost": C3Ghost, "C3_CA": C3_CA}[name]
        sc = rest[0] if len(rest) > 0 else True
        g = rest[1] if len(rest) > 1 else 1
        return cls(c2, n, sc, g), c2  # repeats fold into the block (reference :455-457)
    if name == "C3SPP":
        k = tuple(rest[0]) if len(rest) > 0 else (5, 9, 13)
        return C3SPP(c2, k, n), c2
    if name == "BasicStage":
        # reference pops the c2 arg (models/yolo.py:470-471): output = c1
        depth = rest[0] if rest else 1
        return BasicStage(dim=c1, depth=depth), c2
    if name == "PatchEmbed_FasterNet":
        patch = rest[0] if len(rest) > 0 else 4
        stride = rest[1] if len(rest) > 1 else patch
        return PatchEmbedFasterNet(c2, patch, stride), c2
    if name == "PatchMerging_FasterNet":
        k = rest[0] if len(rest) > 0 else 2
        stride = rest[1] if len(rest) > 1 else 2
        return PatchMergingFasterNet(c2, k, stride), c2
    if name == "RFAConv":
        k = rest[0] if len(rest) > 0 else 3
        s = rest[1] if len(rest) > 1 else 1
        return RFAConv(c2, k, s), c2
    if name == "RFCAConv":
        k = rest[0] if len(rest) > 0 else 3
        s = rest[1] if len(rest) > 1 else 1
        return RFCAConv(c2, k, s), c2
    if name == "RFCBAMConv":
        k = rest[0] if len(rest) > 0 else 3
        s = rest[1] if len(rest) > 1 else 1
        return RFCBAMConv(c2, k, s), c2
    if name == "Conv_BN_HSwish":
        return Conv_BN_HSwish(c2, rest[0] if rest else 1), c2
    if name == "MobileNetV3_InvertedResidual":
        hidden, k, s, use_se, use_hs = (rest + [c2, 3, 1, 0, 0])[:5]
        return MobileNetV3_InvertedResidual(c2, hidden, k, s, bool(use_se), bool(use_hs)), c2
    if name == "Shuffle_Block":
        return Shuffle_Block(c2, rest[0] if rest else 1), c2
    if name == "CBRM":
        return CBRM(c2), c2
    if name == "G_bneck":
        midc, k, s = (rest + [16, 5, 1])[:3]
        use_se = bool(rest[3]) if len(rest) > 3 else False
        return G_bneck(c2, midc, k, s, use_se), c2
    if name == "stem":
        return Stem(c2, rest[0] if rest else "relu6"), c2
    if name == "iRMB":
        return iRMB(c2, *rest[:0]), c2
    if name == "MBConvBlock":
        k, s, expand = (rest + [3, 1, 1])[:3]
        drop = rest[3] if len(rest) > 3 else 0.0
        has_se = bool(rest[4]) if len(rest) > 4 else False
        return MBConvBlock(c2, k, s, expand, drop, has_se), c2
    raise KeyError(name)


CH_MODULES = {
    "Conv", "DWConv", "DWConvTranspose2d", "GhostConv", "Bottleneck", "GhostBottleneck",
    "SPP", "SPPF", "Focus", "CrossConv", "MixConv2d", "BottleneckCSP", "C3", "C3x",
    "C3TR", "C3SPP", "C3Ghost", "C3_CA", "BasicStage", "PatchEmbed_FasterNet",
    "PatchMerging_FasterNet", "RFAConv", "RFCAConv", "RFCBAMConv", "Conv_BN_HSwish",
    "MobileNetV3_InvertedResidual", "Shuffle_Block", "CBRM", "G_bneck", "stem", "MBConvBlock",
    "iRMB",
}

# Blocks whose repeat count folds inside the block itself
_FOLD_N = {"BottleneckCSP", "C3", "C3x", "C3TR", "C3Ghost", "C3_CA", "C3SPP"}


def parse_model(cfg: dict, ch_in: int = 3):
    """Parse a model config dict into (layers, froms, save, ch, meta).

    Mirrors the reference's channel bookkeeping exactly (depth/width gains,
    make_divisible, save-list) so converted checkpoints align layer-by-layer.
    """
    anchors = cfg["anchors"]
    nc = int(cfg["nc"])
    gd = float(cfg.get("depth_multiple", 1.0))
    gw = float(cfg.get("width_multiple", 1.0))
    act = _resolve_act(cfg.get("activation"))

    na = (len(anchors[0]) // 2) if isinstance(anchors, (list, tuple)) else int(anchors)
    no = na * (nc + 5)
    names = {"nc": nc, "anchors": anchors, "None": None}

    layers, froms, save = [], [], []
    ch = [ch_in]

    for i, (f, n, mname, args) in enumerate(list(cfg["backbone"]) + list(cfg["head"])):
        args = [_resolve_arg(a, names) for a in args]
        n_eff = max(round(n * gd), 1) if n > 1 else n

        if mname in CH_MODULES:
            c1 = ch[f if isinstance(f, int) else f[0]]
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            inner_n = n_eff if mname in _FOLD_N else 1
            module, c2 = _build_ch_module(mname, c1, c2, list(args[1:]), inner_n, act)
            if mname not in _FOLD_N and n_eff > 1:
                # stack identical copies (cheap: same static config)
                module = Stack(tuple(
                    _build_ch_module(mname, c1 if j == 0 else c2, c2, list(args[1:]), 1, act)[0]
                    for j in range(n_eff)
                ))
        elif mname == "nn.BatchNorm2d":
            module, c2 = BatchNormLayer(), ch[f]
        elif mname == "Concat":
            module, c2 = Concat(), sum(ch[x] for x in f)
        elif mname in ("BiFPN_Add2", "BiFPN_Add3"):
            c2 = max(ch[x] for x in f)
            module = (BiFPN_Add2 if mname == "BiFPN_Add2" else BiFPN_Add3)(c2)
        elif mname in ("Detect", "Segment"):
            ch_list = tuple(ch[x] for x in f)
            head_anchors = args[1]
            if isinstance(head_anchors, int):  # anchor-free count placeholder
                head_anchors = [list(range(head_anchors * 2))] * len(f)
            head_anchors = _tuplify(head_anchors)
            if mname == "Detect":
                module, c2 = Detect(nc=args[0], anchors=head_anchors), None
            else:
                nm = args[2] if len(args) > 2 else 32
                npr = make_divisible((args[3] if len(args) > 3 else 256) * gw, 8)
                module, c2 = Segment(nc=args[0], anchors=head_anchors, nm=nm, npr=npr), None
        elif mname == "Classify":
            c2 = args[0]
            module = Classify(c2, *(args[1:]))
        elif mname == "nn.Upsample":
            module, c2 = Upsample(args[0], int(args[1]), args[2] if len(args) > 2 else "nearest"), ch[f]
        elif mname == "nn.MaxPool2d":
            k, s, p = (args + [None, 0])[:3] if len(args) >= 1 else (2, None, 0)
            module, c2 = MaxPool2dLayer(k, s, p), ch[f]
        elif mname == "nn.ZeroPad2d":
            module, c2 = ZeroPad2dLayer(tuple(args[0])), ch[f]
        elif mname == "Contract":
            gain = args[0] if args else 2
            module, c2 = Contract(gain), ch[f] * gain**2
        elif mname == "Expand":
            gain = args[0] if args else 2
            module, c2 = Expand(gain), ch[f] // gain**2
        else:
            raise KeyError(f"unknown module {mname!r} at layer {i}")

        layers.append(module)
        froms.append(_tuplify(f))
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            ch = []
        ch.append(c2)

    meta = {"nc": nc, "anchors": _tuplify(anchors), "na": na, "act": act}
    return tuple(layers), tuple(froms), tuple(sorted(set(save))), ch, meta


class YOLONet(nn.Module):
    """Graph executor: sequential walk with multi-input routing via the
    from-list and a save-dict for skip connections (reference
    models/yolo.py:173-196 BaseModel._forward_once)."""

    layers: Tuple[nn.Module, ...]
    froms: Tuple[Any, ...]
    save: Tuple[int, ...]
    default_act: Any = None

    def __call__(self, x, train: bool = False):
        if self.default_act:
            from ..nn import functional as F

            F.DEFAULT_ACT = self.default_act  # trace-time constant; see functional.py
        from ..nn.functional import LazyConcat

        ys = []  # full per-layer output list (None if not in save-list), so
        out = x  # negative from-indices (e.g. -2) resolve like the reference
        for i, (m, f) in enumerate(zip(self.layers, self.froms)):
            if f != -1:
                if isinstance(f, int):
                    out = ys[f]
                else:
                    out = [out if j == -1 else ys[j] for j in f]
            # a deferred concat (nn/functional.LazyConcat) stays lazy only for
            # consumers that split their conv kernels along cin; everyone else
            # (and the save-list, whose consumers index dense arrays) gets the
            # materialized tensor
            if isinstance(out, LazyConcat) and not getattr(m, "accepts_lazy_concat", False):
                out = out.materialize()
            elif isinstance(out, list):
                out = [o.materialize() if isinstance(o, LazyConcat) else o for o in out]
            out = m(out, train=train)
            if i in self.save or i == len(self.layers) - 1:
                if isinstance(out, LazyConcat):
                    out = out.materialize()
                ys.append(out)
            else:
                ys.append(None)
        if isinstance(out, LazyConcat):
            out = out.materialize()
        return out
