"""MultiBackend: uniform inference over every weight format we emit.

Capability parity with reference models/common.py:558-862 (DetectMultiBackend,
12 torch-world formats) for the formats that exist in the JAX/TPU world:
native .ckpt, reference .pt (converted), serialized StableHLO, TF SavedModel,
frozen GraphDef, TFLite. Suffix-based type detection, uniform
``forward(images_uint8) -> (B, N, 5+nc)`` raw predictions, ``warmup()``,
stride/nc/names metadata loading.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _load_meta(path):
    p = Path(str(path) + ".meta.json")
    if p.exists():
        return json.loads(p.read_text())
    return {}


class MultiBackend:
    """forward(images) accepts (B, H, W, 3) uint8 RGB and returns decoded
    (B, N, 5+nc) predictions regardless of the underlying format."""

    def __init__(self, weights, cfg="lead-yolo", nc=None, img_size: int = 640):
        w = str(weights)
        self.type = self._model_type(w)
        self.meta = _load_meta(w)
        self.stride = tuple(self.meta.get("stride", (8, 16, 32)))
        self.names = self.meta.get("names")
        self.nc = self.meta.get("nc", nc)
        self.img_size = img_size

        # remote detections arrive post-NMS (xyxy, conf, cls) — consumers must
        # skip their own NMS when this is set (reference routes triton:// URLs
        # the same way, models/common.py:841-854)
        self.post_nms = self.type == "remote"

        if self.type == "remote":
            from ..serve.remote import RemoteModel

            url = w[len("remote://"):] if w.startswith("remote://") else w
            if "//" not in url:
                url = "http://" + url
            base, _, name = url.rpartition("/")
            self._client = RemoteModel(base, name)

            def remote_fwd(x):
                x = np.asarray(x)
                dets = [self._client(im[:, :, ::-1])[0] for im in x]  # RGB->BGR wire format
                m = max((len(d) for d in dets), default=0)
                out = np.zeros((len(dets), m, 6), np.float32)
                for i, d in enumerate(dets):
                    out[i, : len(d)] = d
                return out

            self._fwd = remote_fwd
        elif self.type in ("ckpt", "pt"):
            from ..cli.val import load_weights

            self.model, self.variables = load_weights(w, cfg, nc=nc)
            self.nc = self.model.nc

            self._jit = jax.jit(
                lambda v, x: self.model.apply(v, x.astype(jnp.float32) / 255.0, train=False, decode=True)
            )
            self._fwd = lambda x: np.asarray(self._jit(self.variables, jnp.asarray(x)))
        elif self.type == "stablehlo":
            exp = jax.export.deserialize(Path(w).read_bytes())
            call = jax.jit(exp.call)
            self._fwd = lambda x: np.asarray(call(jnp.asarray(x, jnp.uint8)))
        elif self.type == "saved_model":
            import tensorflow as tf

            m = tf.saved_model.load(w)
            self._fwd = lambda x: m.f(tf.constant(np.asarray(x, np.uint8))).numpy()
        elif self.type == "pb":
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(w).read_bytes())

            def wrap(gd, inputs, outputs):
                x = tf.compat.v1.wrap_function(lambda: tf.compat.v1.import_graph_def(gd, name=""), [])
                g = x.graph
                return x.prune(
                    tf.nest.map_structure(g.as_graph_element, inputs),
                    tf.nest.map_structure(g.as_graph_element, outputs),
                )

            # exact tensor names are recorded at export time (meta.json); the
            # structural fallback only runs for artifacts without metadata
            inp = (self.meta.get("graph_inputs") or [None])[0]
            out = (self.meta.get("graph_outputs") or [None])[0]
            if inp is None:
                ops = [n.name for n in gd.node]
                inp = next(n for n in ops if "args" in n.lower() or n.startswith("x")) + ":0"
                out = ops[-1] + ":0"
            self._frozen = wrap(gd, inp, out)
            self._fwd = lambda x: self._frozen(tf.constant(np.asarray(x, np.uint8))).numpy()
        elif self.type == "tflite":
            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=w)
            self._interp.allocate_tensors()
            self._in = self._interp.get_input_details()[0]
            self._outs = self._interp.get_output_details()

            if self.meta.get("raw_heads"):
                # "8x8-split" int8 artifacts emit the raw per-scale head maps
                # (quantized region ends before decode, so boxes never pass
                # through a quantizer); decode here in float using the meta's
                # anchors/strides — the exact decode the in-graph path runs
                from .heads import decode_predictions

                anchors_px = np.asarray(self.meta["anchors"], np.float32)
                agrid = anchors_px / np.asarray(self.stride, np.float32)[:, None, None]
                decode = jax.jit(
                    lambda outs: decode_predictions(outs, agrid, self.stride, self.nc)
                )

                def tflite_raw_fwd(x):
                    self._interp.set_tensor(self._in["index"], np.asarray(x, self._in["dtype"]))
                    self._interp.invoke()
                    outs = [self._interp.get_tensor(d["index"]) for d in self._outs]
                    outs.sort(key=lambda o: -o.shape[1])  # P3 (largest ny) first
                    return np.asarray(decode([jnp.asarray(o, jnp.float32) for o in outs]))

                self._fwd = tflite_raw_fwd
            else:
                def tflite_fwd(x):
                    self._interp.set_tensor(self._in["index"], np.asarray(x, self._in["dtype"]))
                    self._interp.invoke()
                    y = self._interp.get_tensor(self._outs[0]["index"])
                    if self.meta.get("normalized"):
                        # int8 artifacts carry [0,1] boxes (one per-tensor scale
                        # must cover boxes AND probabilities); rescale to pixels
                        # like the reference (models/common.py:751-754)
                        y = np.concatenate([y[..., :4] * float(self.img_size), y[..., 4:]], axis=-1)
                    return y

                self._fwd = tflite_fwd
        else:
            raise ValueError(f"unsupported weights format: {w}")

    @staticmethod
    def _model_type(w: str) -> str:
        """Suffix-based backend detection (reference models/common.py:841-854)."""
        if w.startswith(("http://", "https://", "remote://")):
            return "remote"
        suffixes = {
            ".ckpt": "ckpt",
            ".pt": "pt",
            ".stablehlo": "stablehlo",
            ".pb": "pb",
            ".tflite": "tflite",
        }
        for s, t in suffixes.items():
            if w.endswith(s):
                return t
        if Path(w).is_dir() and (Path(w) / "saved_model.pb").exists():
            return "saved_model"
        if w.endswith("_saved_model"):
            return "saved_model"
        return "unknown"

    def forward(self, images) -> np.ndarray:
        return np.asarray(self._fwd(images))

    __call__ = forward

    def warmup(self, shape=None):
        """One dummy inference to trigger compilation (reference
        models/common.py:833-839)."""
        shape = shape or (1, self.img_size, self.img_size, 3)
        self.forward(np.zeros(shape, np.uint8))
