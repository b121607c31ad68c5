"""Export subsystem: checkpoint -> deployable artifacts.

Capability parity with reference export.py:80-612, re-targeted to the formats
that make sense from JAX/TPU:

| format       | artifact                | via                                |
|--------------|-------------------------|------------------------------------|
| stablehlo    | .stablehlo (serialized) | jax.export — the TPU-native engine |
| saved_model  | TF SavedModel dir       | jax2tf                             |
| pb           | frozen GraphDef         | TF convert_variables_to_constants  |
| tflite       | .tflite (fp32/fp16/int8)| TFLiteConverter (+representative)  |
| onnx / coreml / openvino / engine | gated: clear error when the vendor
|              toolchain is absent (none are baked into this image).        |

Each export embeds metadata (stride/nc/names) next to the artifact like the
reference's TFLite metadata embed (export.py:459).
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def export_formats():
    """Format table (reference export.py:80-96)."""
    return [
        # name, argument, suffix, supported-here
        ("StableHLO", "stablehlo", ".stablehlo", True),
        ("TF SavedModel", "saved_model", "_saved_model", True),
        ("TF GraphDef", "pb", ".pb", True),
        ("TF Lite", "tflite", ".tflite", True),
        ("ONNX", "onnx", ".onnx", False),
        ("CoreML", "coreml", ".mlmodel", False),
        ("OpenVINO", "openvino", "_openvino_model", False),
        ("TensorRT", "engine", ".engine", False),
    ]


def try_export(fn):
    """Wrapper printing success/failure + size/time (reference export.py @try_export)."""

    def wrapper(*args, **kwargs):
        name = fn.__name__.replace("export_", "")
        t0 = time.time()
        try:
            out = fn(*args, **kwargs)
            sz = _size_mb(out)
            print(f"export {name}: OK -> {out} ({sz:.1f} MB, {time.time() - t0:.1f}s)")
            return out
        except Exception as e:
            print(f"export {name}: FAILED ({e})")
            return None

    return wrapper


def _size_mb(p):
    p = Path(p)
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) / 1e6
    return p.stat().st_size / 1e6 if p.exists() else 0.0


def _infer_fn(model, variables, decode=True, normalize=None):
    """normalize: image size to divide the box channels by, putting the whole
    output tensor in [0,1] — required for int8 TFLite, where ONE per-tensor
    scale must cover boxes AND probabilities (the reference normalizes in
    TFDetect for the same reason, models/tf.py:273-321, and rescales at load,
    models/common.py:751-754)."""

    def fn(images):
        x = images.astype(jnp.float32) / 255.0
        preds = model.apply(variables, x, train=False, decode=decode, normalize=normalize)
        return preds[0] if isinstance(preds, tuple) else preds

    return fn


def _write_meta(path, model, names=None, **extra):
    meta = {
        "stride": list(model.strides),
        "nc": model.nc,
        "names": names or {i: str(i) for i in range(model.nc)},
        "anchors": np.asarray(model.anchors_px).tolist(),
        **extra,
    }
    Path(str(path) + ".meta.json").write_text(json.dumps(meta))


# Deployable artifacts must not be pinned to the platform that happened to do
# the exporting (an artifact exported on TPU would refuse to run under a CPU
# TF runtime: "current platform CPU is not among the platforms required").
# Multi-platform lowering keeps one artifact valid on every target.
_EXPORT_PLATFORMS = ("cpu", "tpu")


@try_export
def export_stablehlo(model, variables, img_size=640, batch=1, out="model.stablehlo", names=None):
    """Serialize the jitted forward+decode as portable StableHLO — the
    TPU-native 'engine' format (loads back with jax.export and runs on any
    jax backend)."""
    fn = _infer_fn(model, variables)
    exp = jax.export.export(jax.jit(fn), platforms=_EXPORT_PLATFORMS)(
        jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.uint8)
    )
    Path(out).write_bytes(exp.serialize())
    _write_meta(out, model, names)
    return out


def _tf_module(model, variables, img_size, batch, platforms=_EXPORT_PLATFORMS, normalize=None):
    import tensorflow as tf
    from jax.experimental import jax2tf

    fn = _infer_fn(model, variables, normalize=normalize)
    tf_fn = jax2tf.convert(fn, with_gradient=False, native_serialization_platforms=list(platforms))
    m = tf.Module()
    m.f = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec((batch, img_size, img_size, 3), tf.uint8)],
    )
    return m


@try_export
def export_saved_model(model, variables, img_size=640, batch=1, out="model_saved_model", names=None):
    import tensorflow as tf

    m = _tf_module(model, variables, img_size, batch)
    tf.saved_model.save(m, out)
    _write_meta(out, model, names)
    return out


@try_export
def export_pb(model, variables, img_size=640, batch=1, out="model.pb", names=None):
    import tensorflow as tf
    from tensorflow.python.framework.convert_to_constants import convert_variables_to_constants_v2

    m = _tf_module(model, variables, img_size, batch)
    frozen = convert_variables_to_constants_v2(m.f.get_concrete_function())
    tf.io.write_graph(frozen.graph, str(Path(out).parent or "."), Path(out).name, as_text=False)
    # record the real graph tensor names so inference never has to guess
    # (reference export.py names its output explicitly; round-1's suffix
    # heuristic in models/backend.py was the failure)
    _write_meta(
        out, model, names,
        graph_inputs=[t.name for t in frozen.inputs],
        graph_outputs=[t.name for t in frozen.outputs],
    )
    return out


@try_export
def export_tflite(model, variables, img_size=640, batch=1, out="model.tflite", int8=False,
                  rep_data=None, names=None, quant_mode="8x8"):
    """quant_mode (when int8=True):
      "8x8"        — full-integer: int8 weights + int8 activations, decode
                     in-graph on [0,1]-normalized boxes (reference
                     export.py:372-401 equivalent; EdgeTPU-compatible).
      "16x8"       — int8 weights + int16 activations (TFLite 16x8 mode):
                     recovers most of the 8x8 accuracy loss because the
                     activation grid is 256x finer; not EdgeTPU-compatible.
      "8x8-split"  — full-integer backbone+heads, decode OUTSIDE the
                     quantized graph: the artifact emits the raw PRE-sigmoid
                     per-scale head maps (B, ny, nx, na, no) and MultiBackend
                     applies sigmoid + decode in float at load. Removes the
                     shared-output-scale problem entirely — boxes never pass
                     through a quantizer.
    """
    import tensorflow as tf

    split = int8 and quant_mode == "8x8-split"
    # int8 in-graph decode emits [0,1]-normalized boxes so one per-tensor
    # scale covers the whole output; MultiBackend rescales at load (meta
    # "normalized"). The split mode skips decode instead.
    if split:
        def raw_fn(images):
            x = images.astype(jnp.float32) / 255.0
            # raw per-scale maps (B, ny, nx, na, no) BEFORE sigmoid (logits;
            # MultiBackend.decode_predictions owns the sigmoid): their
            # dynamic range is modest and zero-centered, ideal for int8
            return tuple(model.apply(variables, x, train=False, decode=False))

        from jax.experimental import jax2tf

        tf_fn = jax2tf.convert(raw_fn, with_gradient=False,
                               native_serialization_platforms=list(_EXPORT_PLATFORMS))
        m = tf.Module()
        m.f = tf.function(tf_fn, autograph=False,
                          input_signature=[tf.TensorSpec((batch, img_size, img_size, 3), tf.uint8)])
    else:
        m = _tf_module(model, variables, img_size, batch, normalize=img_size if int8 else None)
    conv = tf.lite.TFLiteConverter.from_concrete_functions([m.f.get_concrete_function()], m)
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    if int8:
        assert rep_data is not None, "int8 export needs a representative dataset path"
        from ..data.datasets import YoloDataset

        ds = YoloDataset(rep_data, img_size=img_size, augment=False)

        def rep():
            for i in range(min(100, len(ds))):
                im, _ = ds[i]
                yield [im[None].astype(np.uint8)]

        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        conv.representative_dataset = rep
        if quant_mode == "16x8":
            conv.target_spec.supported_ops = [
                tf.lite.OpsSet.EXPERIMENTAL_TFLITE_BUILTINS_ACTIVATIONS_INT16_WEIGHTS_INT8,
                tf.lite.OpsSet.SELECT_TF_OPS,
            ]
    Path(out).write_bytes(conv.convert())
    _write_meta(out, model, names, normalized=bool(int8) and not split,
                raw_heads=bool(split), quant_mode=quant_mode if int8 else None)
    return out


def _gated(name, hint):
    @try_export
    def exporter(*a, **k):
        raise ImportError(f"{name} toolchain not available in this image ({hint})")

    exporter.__name__ = f"export_{name}"
    return exporter


export_onnx = _gated("onnx", "pip install onnx tf2onnx")
export_coreml = _gated("coreml", "pip install coremltools")
export_openvino = _gated("openvino", "pip install openvino-dev")
export_engine = _gated("engine", "TensorRT requires NVIDIA hardware")

EXPORTERS = {
    "stablehlo": export_stablehlo,
    "saved_model": export_saved_model,
    "pb": export_pb,
    "tflite": export_tflite,
    "onnx": export_onnx,
    "coreml": export_coreml,
    "openvino": export_openvino,
    "engine": export_engine,
}


def run(weights, include=("stablehlo",), cfg="lead-yolo", imgsz=640, batch=1, int8=False, data=None, out_dir="runs/export", quant_mode="8x8"):
    from .val import load_weights

    from ..utils import disable_fused_kernels

    model, variables = load_weights(weights, cfg)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(weights).stem
    outs = []
    # exported graphs must stay portable (jax2tf cannot serialize pallas_call)
    with disable_fused_kernels():
        for fmt in include:
            suffix = dict((a, s) for _, a, s, _ in export_formats())[fmt]
            out = out_dir / (stem + suffix)
            kwargs = dict(img_size=imgsz, batch=batch, out=str(out))
            if fmt == "tflite":
                kwargs.update(int8=int8, rep_data=data, quant_mode=quant_mode)
            outs.append(EXPORTERS[fmt](model, variables, **kwargs))
    return outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--include", nargs="+", default=["stablehlo"])
    p.add_argument("--cfg", default="lead-yolo")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--quant-mode", default="8x8", choices=["8x8", "16x8", "8x8-split"],
                   help="int8 flavor: full-integer in-graph decode / int16 activations / "
                        "full-integer with decode outside the quantized graph")
    p.add_argument("--data", default=None)
    p.add_argument("--out-dir", default="runs/export")
    a = p.parse_args()
    run(a.weights, a.include, a.cfg, a.imgsz, a.batch, a.int8, a.data, a.out_dir, a.quant_mode)


if __name__ == "__main__":
    main()
