"""Validation CLI (reference val.py:349-378 surface equivalent).

Accepts our .ckpt checkpoints or reference .pt checkpoints (converted on the
fly through the stub unpickler). Tasks: train/val/test/speed/study
(reference val.py:384-413 — speed switches to conf 0.25 / iou 0.45 / no JSON,
study sweeps resolutions).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from ..eval.validator import validate
from ..models.yolo import DetectionModel
from ..train.trainer import resolve_data
from ..utils.checkpoint import load_checkpoint


def load_weights(weights, cfg, nc=None):
    """Returns (model, variables) from a .ckpt or reference .pt file."""
    if str(weights).endswith(".pt"):
        from ..utils.torch_convert import load_reference_checkpoint

        model = DetectionModel(cfg, nc=nc)
        variables, meta, report = load_reference_checkpoint(model, weights)
        return model, variables
    state, meta = load_checkpoint(weights)
    nc = nc or meta.get("nc")
    model = DetectionModel(meta.get("cfg", cfg), nc=nc)
    if isinstance(state, dict) and "ema" in state:
        variables = state["ema"]["variables"]
    elif isinstance(state, dict) and "params" in state and "batch_stats" in state:
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
    else:
        variables = state
    return model, variables


def run(
    weights,
    data="ssdd",
    cfg="lead-yolo",
    imgsz=640,
    batch_size=32,
    conf_thres=0.001,
    iou_thres=0.6,
    max_det=300,
    task="val",
    half=True,
    workers=8,
    verbose=True,
    augment=False,
    rect=True,
    save_json=None,
    fused=False,
    multichip=False,
):
    if fused:
        from ..utils import set_fused_kernels

        set_fused_kernels(True)
    mesh = None
    if multichip:
        # data-parallel eval over all local devices (see validator.py `mesh`)
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    if task == "speed":
        # benchmark-mode thresholds, no JSON (reference val.py:384-390)
        conf_thres, iou_thres, save_json = 0.25, 0.45, None
    data_cfg = resolve_data(data)
    model, variables = load_weights(weights, cfg, nc=data_cfg["nc"])
    split = data_cfg.get(task if task not in ("study", "speed") else "val") or data_cfg["val"]
    if task == "study":
        # resolution sweep (reference val.py:400-411): mAP + latency per size
        rows = []
        for sz in range(256, 1024 + 64, 128):
            r = validate(model, variables, split, img_size=sz, batch_size=batch_size,
                         conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
                         compute_dtype=jnp.bfloat16 if half else jnp.float32, workers=workers,
                         mesh=mesh)
            rows.append((sz, r["map50"], r["map"], r["speed_ms"]))
            print(f"study {sz}px: mAP50 {r['map50']:.4f} mAP {r['map']:.4f} {r['speed_ms']:.2f} ms/img")
        return rows
    res = validate(
        model,
        variables,
        split,
        img_size=imgsz,
        batch_size=batch_size,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        compute_dtype=jnp.bfloat16 if half else jnp.float32,
        names=data_cfg.get("names"),
        verbose=verbose,
        workers=workers,
        augment=augment,
        rect=rect,
        save_json=save_json,
        mesh=mesh,
    )
    print(
        f"P {res['mp']:.4f}  R {res['mr']:.4f}  mAP50 {res['map50']:.4f}  mAP50-95 {res['map']:.4f}  "
        f"({res['seen']} images, {res['speed_ms']:.2f} ms/img, {res['fps']:.1f} FPS)"
    )
    if save_json is not None:
        # COCO-protocol mAP over the written records via the FIRST-PARTY
        # evaluator (reference val.py:313-336 shells out to pycocotools and
        # dies without it; eval/cocoeval.py needs nothing but numpy)
        from ..eval.cocoeval import evaluate_json

        print(f"COCO-protocol evaluation of {save_json} (first-party, eval/cocoeval.py):")
        res["coco_stats"] = evaluate_json(save_json, dataset=res["dataset"])
    return res


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--data", type=str, default="ssdd")
    p.add_argument("--cfg", type=str, default="lead-yolo")
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--task", type=str, default="val",
                   choices=["train", "val", "test", "speed", "study"])
    p.add_argument("--no-half", dest="half", action="store_false")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--augment", action="store_true", help="TTA scale+flip ensemble")
    p.add_argument("--no-rect", dest="rect", action="store_false", help="square letterbox instead of rect buckets")
    p.add_argument("--save-json", type=str, default=None, help="write native-space COCO records here")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas inference kernels (TPU; mAP-invariant, slow first compile)")
    p.add_argument("--multichip", action="store_true",
                   help="data-parallel eval over all local devices (batch sharded on the mesh)")
    return p.parse_args()


def main():
    run(**vars(parse_opt()))


if __name__ == "__main__":
    main()
