"""Hub-style model factory (reference hubconf.py:16-169 equivalent).

    from hubconf import load
    model = load("lead-yolo", weights="runs/train/exp/best.ckpt")
    results = model("image.jpg")
    results.print(); results.pandas().xyxy[0]

Also exposes per-config factories mirroring the reference's yolov5n..x entry
points. Accepts our .ckpt checkpoints or reference .pt files (converted via
the stub unpickler).
"""
from __future__ import annotations

import jax


def load(cfg="lead-yolo", weights=None, nc=None, size=640, autoshape=True, names=None):
    from leadyolo_tpu.models.autoshape import AutoShape
    from leadyolo_tpu.models.yolo import DetectionModel

    if weights and str(weights).endswith(".pt"):
        from leadyolo_tpu.utils.torch_convert import load_reference_checkpoint

        model = DetectionModel(cfg, nc=nc)
        variables, meta, _ = load_reference_checkpoint(model, weights)
        names = names or meta.get("names")
    elif weights:
        from leadyolo_tpu.utils.checkpoint import load_checkpoint

        state, meta = load_checkpoint(weights)
        model = DetectionModel(meta.get("cfg", cfg), nc=nc or meta.get("nc"))
        if isinstance(state, dict) and "ema" in state:
            variables = state["ema"]["variables"]
        else:
            variables = state
    else:
        model = DetectionModel(cfg, nc=nc)
        variables = model.init(jax.random.PRNGKey(0))
    if not autoshape:
        return model, variables
    return AutoShape(model, variables, names=names, size=size)


def lead_yolo(weights=None, **kw):
    return load("lead-yolo", weights, **kw)


def yolov5n(weights=None, **kw):
    return load("yolov5n", weights, **kw)


def yolov5s(weights=None, **kw):
    return load("yolov5s", weights, **kw)


def yolov5m(weights=None, **kw):
    return load("yolov5m", weights, **kw)


def yolov5l(weights=None, **kw):
    return load("yolov5l", weights, **kw)


def yolov5x(weights=None, **kw):
    return load("yolov5x", weights, **kw)


def custom(path, cfg="lead-yolo", **kw):
    return load(cfg, path, **kw)
