"""Classification pipeline: train / val / predict.

Capability parity with reference classify/{train,val,predict}.py (own loop,
smart cross-entropy with label smoothing, EMA, top1/top5 eval, streaming
prediction) built on the same optimizer/EMA/step machinery as detection.
Datasets use the ImageFolder layout (root/class_x/img.jpg), like the
reference's ClassificationDataset (utils/dataloaders.py:1163-1221).
"""
from __future__ import annotations

import argparse
import math
import random
import time
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolo import ClassificationModel
from ..train.optim import ema_init, ema_update, one_cycle_lf, param_groups, sgd_init, sgd_update
from ..utils.checkpoint import load_checkpoint, save_checkpoint

IMG_EXTS = (".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp")


class ImageFolderDataset:
    def __init__(self, root, img_size=224, augment=False, seed=0):
        root = Path(root)
        self.classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        self.samples = [
            (str(f), ci)
            for ci, c in enumerate(self.classes)
            for f in sorted((root / c).rglob("*"))
            if f.suffix.lower() in IMG_EXTS
        ]
        assert self.samples, f"no images under {root}"
        self.img_size = img_size
        self.augment = augment
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, cls = self.samples[i]
        im = cv2.imread(path)
        h, w = im.shape[:2]
        s = self.img_size
        if self.augment:
            # random resized crop (scale 0.08-1.0) + horizontal flip
            for _ in range(10):
                area = h * w * self.rng.uniform(0.5, 1.0)
                ar = math.exp(self.rng.uniform(math.log(3 / 4), math.log(4 / 3)))
                cw, ch_ = int(round(math.sqrt(area * ar))), int(round(math.sqrt(area / ar)))
                if cw <= w and ch_ <= h:
                    x0 = self.rng.randint(0, w - cw)
                    y0 = self.rng.randint(0, h - ch_)
                    im = im[y0 : y0 + ch_, x0 : x0 + cw]
                    break
            im = cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
            if self.rng.random() < 0.5:
                im = im[:, ::-1]
        else:
            # resize short side then center crop (reference classify_transforms)
            r = s / min(h, w)
            im = cv2.resize(im, (int(round(w * r)), int(round(h * r))), interpolation=cv2.INTER_LINEAR)
            hh, ww = im.shape[:2]
            top, left = (hh - s) // 2, (ww - s) // 2
            im = im[top : top + s, left : left + s]
        return np.ascontiguousarray(im[:, :, ::-1]), cls  # RGB


def cross_entropy(logits, labels, smoothing=0.0):
    """Smart CE with label smoothing (reference utils/torch_utils.py
    smartCrossEntropyLoss)."""
    nc = logits.shape[-1]
    logp = jax.nn.log_softmax(logits)
    on = 1.0 - smoothing + smoothing / nc
    off = smoothing / nc
    target = jax.nn.one_hot(labels, nc) * (on - off) + off
    return -(target * logp).sum(-1).mean()


def train(
    cfg="yolov5s",
    data_dir=None,
    nc=None,
    epochs=10,
    batch_size=64,
    img_size=224,
    lr0=0.001,
    smoothing=0.1,
    cutoff=10,
    save_dir="runs/train-cls/exp",
    seed=0,
    log_fn=print,
):
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    train_ds = ImageFolderDataset(Path(data_dir) / "train", img_size, augment=True, seed=seed)
    val_root = Path(data_dir) / ("val" if (Path(data_dir) / "val").exists() else "test")
    val_ds = ImageFolderDataset(val_root, img_size, augment=False)
    nc = nc or len(train_ds.classes)

    model = ClassificationModel(cfg, nc=nc, cutoff=cutoff)
    variables = model.init(jax.random.PRNGKey(seed), img_size=img_size)
    params, stats = variables["params"], variables["batch_stats"]
    opt = sgd_init(params)
    ema = ema_init(variables)
    groups = param_groups(params)
    nb = len(train_ds) // batch_size

    @jax.jit
    def step(params, stats, opt, ema, images, labels, lr):
        def loss_fn(p):
            logits, mut = model.net.apply(
                {"params": p, "batch_stats": stats}, images.astype(jnp.float32) / 255.0, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy(logits, labels, smoothing), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt = sgd_update(
            params, grads, opt, lr_main=lr, lr_bias=lr, momentum=0.9, weight_decay=5e-5, groups=groups
        )
        new_ema = ema_update(ema, {"params": new_params, "batch_stats": new_stats})
        return new_params, new_stats, new_opt, new_ema, loss

    @jax.jit
    def infer(variables, images):
        return model.net.apply(variables, images.astype(jnp.float32) / 255.0, train=False)

    best_top1 = 0.0
    idx = list(range(len(train_ds)))
    for epoch in range(epochs):
        random.Random(seed + epoch).shuffle(idx)
        lf = one_cycle_lf(jnp.asarray(float(epoch)), epochs, 0.01)
        lr = lr0 * float(lf)
        losses = []
        t0 = time.time()
        for b in range(nb):
            sel = idx[b * batch_size : (b + 1) * batch_size]
            ims, labs = zip(*(train_ds[i] for i in sel))
            params, stats, opt, ema, loss = step(
                params, stats, opt, ema, jnp.asarray(np.stack(ims)), jnp.asarray(np.array(labs)), lr
            )
            losses.append(loss)
        top1, top5 = validate_arrays(infer, ema.variables, val_ds, batch_size)
        log_fn(
            f"epoch {epoch + 1}/{epochs}: loss {float(np.mean([np.asarray(l) for l in losses])):.4f} "
            f"top1 {top1:.4f} top5 {top5:.4f} lr {lr:.5f} {time.time() - t0:.1f}s"
        )
        meta = {"epoch": epoch, "top1": top1, "nc": nc, "cfg": str(cfg), "classes": train_ds.classes}
        save_checkpoint(save_dir / "last.ckpt", ema.variables, meta)
        if top1 >= best_top1:
            best_top1 = top1
            save_checkpoint(save_dir / "best.ckpt", ema.variables, meta)
    return best_top1


def validate_arrays(infer, variables, ds, batch_size=64):
    correct1 = correct5 = n = 0
    for b0 in range(0, len(ds), batch_size):
        sel = range(b0, min(b0 + batch_size, len(ds)))
        ims, labs = zip(*(ds[i] for i in sel))
        pad = batch_size - len(ims)
        batch = np.stack(list(ims) + [ims[0]] * pad)
        logits = np.asarray(infer(variables, jnp.asarray(batch)))[: len(ims)]
        top5_idx = np.argsort(-logits, axis=1)[:, :5]
        labs = np.array(labs)
        correct1 += (top5_idx[:, 0] == labs).sum()
        correct5 += (top5_idx == labs[:, None]).any(1).sum()
        n += len(labs)
    return correct1 / n, correct5 / n


def val(weights, data_dir, cfg="yolov5s", img_size=224, batch_size=64, log_fn=print):
    variables, meta = load_checkpoint(weights)
    model = ClassificationModel(meta.get("cfg", cfg), nc=meta["nc"], cutoff=10)

    @jax.jit
    def infer(v, images):
        return model.net.apply(v, images.astype(jnp.float32) / 255.0, train=False)

    val_root = Path(data_dir) / ("val" if (Path(data_dir) / "val").exists() else "test")
    ds = ImageFolderDataset(val_root, img_size, augment=False)
    top1, top5 = validate_arrays(infer, variables, ds, batch_size)
    log_fn(f"top1 {top1:.4f} top5 {top5:.4f} ({len(ds)} images)")
    return top1, top5


def predict(weights, source, cfg="yolov5s", img_size=224, log_fn=print):
    variables, meta = load_checkpoint(weights)
    classes = meta.get("classes") or [str(i) for i in range(meta["nc"])]
    model = ClassificationModel(meta.get("cfg", cfg), nc=meta["nc"], cutoff=10)

    @jax.jit
    def infer(v, images):
        return jax.nn.softmax(model.net.apply(v, images.astype(jnp.float32) / 255.0, train=False))

    results = []
    paths = [source] if Path(source).is_file() else sorted(Path(source).rglob("*"))
    for p in paths:
        if Path(p).suffix.lower() not in IMG_EXTS:
            continue
        im = cv2.imread(str(p))
        h, w = im.shape[:2]
        r = img_size / min(h, w)
        im = cv2.resize(im, (int(round(w * r)), int(round(h * r))))
        hh, ww = im.shape[:2]
        top, left = (hh - img_size) // 2, (ww - img_size) // 2
        im = im[top : top + img_size, left : left + img_size, ::-1]
        probs = np.asarray(infer(variables, jnp.asarray(im[None].copy())))[0]
        top5 = np.argsort(-probs)[:5]
        log_fn(f"{p}: " + ", ".join(f"{classes[i]} {probs[i]:.2f}" for i in top5))
        results.append((str(p), probs))
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["train", "val", "predict"])
    p.add_argument("--cfg", default="yolov5s")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--weights", default=None)
    p.add_argument("--source", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--imgsz", type=int, default=224)
    p.add_argument("--save-dir", default="runs/train-cls/exp")
    a = p.parse_args()
    if a.task == "train":
        train(a.cfg, a.data_dir, epochs=a.epochs, batch_size=a.batch_size, img_size=a.imgsz, save_dir=a.save_dir)
    elif a.task == "val":
        val(a.weights, a.data_dir, a.cfg, a.imgsz, a.batch_size)
    else:
        predict(a.weights, a.source, a.cfg, a.imgsz)


if __name__ == "__main__":
    main()
