"""DetectionModel / SegmentationModel / ClassificationModel wrappers.

Capability parity with reference models/yolo.py:253-394: config -> module
graph, stride inference via a dummy forward (here jax.eval_shape — zero
compute), anchor-order check + scaling to grid units, Detect bias priors, and
TTA augmented inference. The wrapper is a plain Python object holding static
config; all compute goes through pure flax apply calls.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .builder import YOLONet, parse_model
from .heads import Classify, Detect, Segment, decode_predictions, detect_bias_init

CONFIG_DIR = Path(__file__).parent / "configs"


def load_config(cfg) -> dict:
    """Resolve a model config: dict passthrough, path, or bare name
    (searched in the packaged configs, e.g. 'lead-yolo', 'yolov5s')."""
    if isinstance(cfg, dict):
        return dict(cfg)
    p = Path(cfg)
    if not p.exists():
        for cand in (CONFIG_DIR / f"{cfg}.yaml", CONFIG_DIR / f"{cfg}", CONFIG_DIR / f"{str(cfg).lower()}.yaml"):
            if cand.exists():
                p = cand
                break
    with open(p) as f:
        return yaml.safe_load(f)


def check_anchor_order(anchors_px: np.ndarray, strides) -> np.ndarray:
    """Flip anchor levels if their area order disagrees with stride order
    (reference utils/autoanchor.py:19-27)."""
    a = anchors_px.prod(-1).mean(-1)  # mean area per level
    da = a[-1] - a[0]
    ds = strides[-1] - strides[0]
    if da and ds and np.sign(da) != np.sign(ds):
        return anchors_px[::-1].copy()
    return anchors_px


class DetectionModel:
    """YAML-built anchor detector (reference models/yolo.py:253-362)."""

    def __init__(self, cfg="lead-yolo", ch: int = 3, nc: Optional[int] = None, anchors=None, img_size: int = 640):
        self.cfg = load_config(cfg)
        if nc is not None and nc != self.cfg.get("nc"):
            self.cfg["nc"] = nc
        if anchors is not None:
            self.cfg["anchors"] = anchors
        self.ch = ch
        self.img_size = img_size

        layers, froms, save, ch_list, meta = parse_model(self.cfg, ch)
        self.net = YOLONet(layers=layers, froms=froms, save=save, default_act=meta["act"])
        self.meta = meta
        self.nc = meta["nc"]
        self.head = layers[-1]
        self.is_detect = isinstance(self.head, (Detect, Segment))

        if self.is_detect:
            self.strides = self._infer_strides()
            a = np.asarray(meta["anchors"], np.float32).reshape(len(self.strides), -1, 2)
            a = check_anchor_order(a, self.strides)
            self.anchors_px = a  # (nl, na, 2) in input pixels
            self.anchors_grid = a / np.asarray(self.strides, np.float32)[:, None, None]
        else:
            self.strides, self.anchors_px, self.anchors_grid = (32,), None, None

    # ---- construction helpers ----

    def _infer_strides(self):
        s = 256
        dummy = jnp.zeros((1, s, s, self.ch), jnp.float32)

        def init_fn(x):
            return self.net.init_with_output(jax.random.PRNGKey(0), x, train=False)

        out_shapes, _ = jax.eval_shape(init_fn, dummy)
        if isinstance(self.head, Segment):
            out_shapes = out_shapes[0]
        return tuple(int(s // o.shape[1]) for o in out_shapes)

    def init(self, key, img_size: Optional[int] = None, class_freq=None):
        """Initialize variables; applies the Detect objectness/class bias
        priors (reference models/yolo.py:352-359)."""
        hw = img_size or self.img_size
        dummy = jnp.zeros((1, hw, hw, self.ch), jnp.float32)
        variables = self.net.init(key, dummy, train=False)
        if self.is_detect:
            variables = self._init_detect_biases(variables, hw, class_freq)
        return variables

    def _init_detect_biases(self, variables, img_size, class_freq=None):
        params = variables["params"]
        head_name = f"layers_{len(self.net.layers) - 1}"
        head = dict(params[head_name])
        for i, s in enumerate(self.strides):
            conv = dict(head[f"m_{i}"])
            conv["bias"] = detect_bias_init(
                jnp.zeros_like(conv["bias"]), s, self.nc, float(img_size), class_freq, no=self.head.no
            )
            head[f"m_{i}"] = conv
        new_params = dict(params)
        new_params[head_name] = head
        out = dict(variables)
        out["params"] = new_params
        return out

    # ---- inference / training entry points ----

    def apply(self, variables, x, train: bool = False, decode: bool = True, rngs=None,
              normalize=None):
        """Forward. train=True returns (raw_outs, new_batch_stats); eval
        returns decoded (B, N, no) predictions (decode=True) or raw maps.
        normalize: emit [0,1]-normalized boxes (int8 export path, see
        decode_predictions)."""
        if train:
            outs, mutated = self.net.apply(variables, x, train=True, mutable=["batch_stats"], rngs=rngs)
            return outs, mutated["batch_stats"]
        outs = self.net.apply(variables, x, train=False)
        if self.is_detect and decode:
            if isinstance(self.head, Segment):
                det, proto = outs
                return self.decode(det, normalize), proto
            return self.decode(outs, normalize)
        return outs

    def decode(self, outs, normalize=None):
        return decode_predictions(outs, self.anchors_grid, self.strides, self.nc, normalize)

    def apply_augmented(self, variables, x):
        """TTA: multi-scale + flip inference with de-scaling and tail clipping
        (reference models/yolo.py:307-350)."""
        h, w = x.shape[1:3]
        scales = (1.0, 0.83, 0.67)
        flips = (None, 2, None)  # 2 = horizontal flip (W axis in NHWC)
        ys = []
        for si, fi in zip(scales, flips):
            xi = x
            if fi == 2:
                xi = xi[:, :, ::-1, :]
            if si != 1.0:
                nh, nw = int(h * si) // 32 * 32 or 32, int(w * si) // 32 * 32 or 32
                xi = jax.image.resize(xi, (x.shape[0], nh, nw, x.shape[3]), "linear")
            y = self.apply(variables, xi, train=False, decode=True)
            # de-scale (reference models/yolo.py:327-339)
            actual_scale = xi.shape[2] / w if si != 1.0 else 1.0
            xy = y[..., :2] / actual_scale
            wh = y[..., 2:4] / actual_scale
            if fi == 2:
                xy = xy.at[..., 0].set(w - xy[..., 0])
            y = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
            ys.append(y)
        # clip tails (reference models/yolo.py:341-350)
        nl = len(self.strides)
        g = sum(4**i for i in range(nl))
        e = 1
        i0 = ys[0].shape[1] // g * sum(4**x for x in range(e))
        ys[0] = ys[0][:, i0:]
        i1 = ys[-1].shape[1] // g * sum(4 ** (nl - 1 - x) for x in range(e))
        ys[-1] = ys[-1][:, :-i1] if i1 else ys[-1]
        return jnp.concatenate(ys, axis=1)

    # ---- info ----

    def num_params(self, variables) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


Model = DetectionModel  # reference alias (models/yolo.py:362)


class SegmentationModel(DetectionModel):
    """Thin subclass (reference models/yolo.py:365)."""

    def __init__(self, cfg="yolov5s-seg", ch=3, nc=None, anchors=None):
        super().__init__(cfg, ch, nc, anchors)


class ClassificationModel:
    """Classifier from a detection backbone cut at ``cutoff``
    (reference models/yolo.py:368-394)."""

    def __init__(self, cfg=None, nc: int = 1000, cutoff: int = 10, ch: int = 3):
        base = DetectionModel(cfg, ch=ch) if not isinstance(cfg, DetectionModel) else cfg
        layers = list(base.net.layers[:cutoff])
        froms = list(base.net.froms[:cutoff])
        layers.append(Classify(nc))
        froms.append(-1)
        save = tuple(s for s in base.net.save if s < cutoff)
        self.net = YOLONet(layers=tuple(layers), froms=tuple(froms), save=save, default_act=base.meta["act"])
        self.nc = nc
        self.ch = ch

    def init(self, key, img_size: int = 224):
        dummy = jnp.zeros((1, img_size, img_size, self.ch), jnp.float32)
        return self.net.init(key, dummy, train=False)

    def apply(self, variables, x, train: bool = False, rngs=None):
        if train:
            return self.net.apply(variables, x, train=True, mutable=["batch_stats"], rngs=rngs)
        return self.net.apply(variables, x, train=False)
