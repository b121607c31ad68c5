"""Segmentation train/val CLI.

Capability parity with reference utils/segment/{train,val}.py drivers (the
fork carries the full seg subsystem): trains a Segment-head model on
YOLO-seg polygon labels with the prototype mask loss, validates box + mask
mAP every epoch.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader
from ..data.seg_datasets import SegmentDataset
from ..eval.seg_validator import validate_seg
from ..models.yolo import DetectionModel
from ..train.loss import LossConfig
from ..train.seg_loss import SegLossConfig
from ..train.step import TrainConfig, init_train_state, make_train_step
from ..train.trainer import load_hyp, resolve_data
from ..utils.checkpoint import save_checkpoint


def train(
    cfg="yolov5s-seg",
    data="ssdd",
    hyp="scratch-low",
    epochs: int = 100,
    batch_size: int = 16,
    img_size: int = 640,
    workers: int = 8,
    save_dir="runs/train-seg/exp",
    compute_dtype=jnp.bfloat16,
    max_targets: int = 64,
    mask_budget: int = 32,
    seed: int = 0,
    val_every: int = 1,
    log_fn=print,
):
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    hyp = load_hyp(hyp)
    data_cfg = resolve_data(data)
    nc = data_cfg["nc"]

    model = DetectionModel(cfg, nc=nc, img_size=img_size)
    variables = model.init(jax.random.PRNGKey(seed), img_size=img_size)

    ds = SegmentDataset(data_cfg["train"], img_size=img_size, augment=True, hyp=hyp, max_targets=max_targets, seed=seed)
    dl = DataLoader(ds, batch_size, workers=workers, seed=seed)
    nb = len(dl)

    lcfg = LossConfig.from_hyp(model, hyp, imgsz=img_size)
    scfg = SegLossConfig(
        nc=nc, anchors=lcfg.anchors, strides=lcfg.strides,
        box_w=lcfg.box_w, obj_w=lcfg.obj_w, cls_w=lcfg.cls_w,
        anchor_t=lcfg.anchor_t, label_smoothing=lcfg.label_smoothing,
        mask_budget=mask_budget,
    )
    tcfg = TrainConfig(
        loss=lcfg,
        lr0=hyp.get("lr0", 0.01),
        lrf=hyp.get("lrf", 0.01),
        warmup_steps=max(3 * nb, 100),
        epochs=epochs,
        steps_per_epoch=nb,
        compute_dtype=compute_dtype,
    )
    step = make_train_step(model, tcfg, seg_cfg=scfg)
    state = init_train_state(variables)

    best = 0.0
    for epoch in range(epochs):
        t0 = time.time()
        dl.set_epoch(epoch)
        metrics = []
        for imgs, targets, tmask, maps in dl:
            state, m = step(state, jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(tmask), jnp.asarray(maps))
            metrics.append(m)
        means = {k: float(np.mean([np.asarray(m[k]) for m in metrics])) for k in ("box", "obj", "seg")}
        # per-epoch seg validation rebuilds a jit executable — minutes per
        # epoch on remote-compile backends; --val-every N (like cli/train.py)
        # keeps smoke runs epoch-bound instead of compile-bound
        do_val = (epoch + 1) % max(val_every, 1) == 0 or epoch + 1 == epochs
        if do_val:
            ema_vars = jax.tree.map(np.asarray, state.ema.variables)
            res = validate_seg(
                model, ema_vars, data_cfg["val"], img_size=img_size, batch_size=batch_size,
                compute_dtype=compute_dtype, max_targets=max_targets, workers=workers,
            )
            fi = 0.1 * res["box"]["map50"] + 0.9 * res["box"]["map"]
            log_fn(
                f"epoch {epoch + 1}/{epochs}: box {means['box']:.4f} obj {means['obj']:.4f} "
                f"seg {means['seg']:.4f} | box mAP50 {res['box']['map50']:.4f} "
                f"mask mAP50 {res['mask']['map50']:.4f} | {time.time() - t0:.1f}s"
            )
        else:
            fi = -1.0
            log_fn(
                f"epoch {epoch + 1}/{epochs}: box {means['box']:.4f} obj {means['obj']:.4f} "
                f"seg {means['seg']:.4f} | {time.time() - t0:.1f}s"
            )
        meta = {"epoch": epoch, "cfg": str(cfg), "nc": nc}
        save_checkpoint(save_dir / "last.ckpt", jax.device_get(state), meta)
        if fi >= best:
            best = fi
            save_checkpoint(save_dir / "best.ckpt", jax.device_get(state), meta)
    return best


def val(weights, data="ssdd", cfg="yolov5s-seg", img_size=640, batch_size=16, log_fn=print):
    from .val import load_weights

    data_cfg = resolve_data(data)
    model, variables = load_weights(weights, cfg, nc=data_cfg["nc"])
    res = validate_seg(model, variables, data_cfg["val"], img_size=img_size, batch_size=batch_size)
    log_fn(
        f"box: P {res['box']['mp']:.4f} R {res['box']['mr']:.4f} mAP50 {res['box']['map50']:.4f} "
        f"mAP {res['box']['map']:.4f} | mask: mAP50 {res['mask']['map50']:.4f} mAP {res['mask']['map']:.4f}"
    )
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["train", "val"])
    p.add_argument("--cfg", default="yolov5s-seg")
    p.add_argument("--data", default="ssdd")
    p.add_argument("--weights", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--save-dir", default="runs/train-seg/exp")
    p.add_argument("--val-every", type=int, default=1,
                   help="validate every N epochs (always on the last)")
    a = p.parse_args()
    if a.task == "train":
        train(a.cfg, a.data, epochs=a.epochs, batch_size=a.batch_size, img_size=a.imgsz,
              save_dir=a.save_dir, val_every=a.val_every)
    else:
        val(a.weights, a.data, a.cfg, a.imgsz, a.batch_size)


if __name__ == "__main__":
    main()
