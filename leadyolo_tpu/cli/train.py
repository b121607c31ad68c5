"""Training CLI (reference train.py:449-492 argparse surface equivalent)."""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..parallel.mesh import make_mesh
from ..train.trainer import train


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default="lead-yolo", help="model config name/path")
    p.add_argument("--data", type=str, default="ssdd", help="dataset yaml name/path")
    p.add_argument("--hyp", type=str, default="scratch-low")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--save-dir", "--project", type=str, default="runs/train/exp")
    p.add_argument("--cos-lr", action="store_true")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--val-every", type=int, default=1)
    p.add_argument("--noval", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--multichip", action="store_true", help="data-parallel over all local devices")
    return p.parse_args()


def main():
    opt = parse_opt()
    mesh = make_mesh() if opt.multichip else None
    train(
        cfg=opt.cfg,
        data=opt.data,
        hyp=opt.hyp,
        epochs=opt.epochs,
        batch_size=opt.batch_size,
        img_size=opt.imgsz,
        workers=opt.workers,
        save_dir=opt.save_dir,
        compute_dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
        cos_lr=opt.cos_lr,
        patience=opt.patience,
        val_every=opt.val_every,
        noval=opt.noval,
        seed=opt.seed,
        resume=opt.resume,
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
