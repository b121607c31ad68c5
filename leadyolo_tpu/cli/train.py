"""Training CLI (reference train.py:449-492 argparse surface equivalent)."""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..parallel.mesh import make_mesh
from ..train.trainer import train


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default="lead-yolo", help="model config name/path")
    p.add_argument("--data", type=str, default="ssdd", help="dataset yaml name/path")
    p.add_argument("--hyp", type=str, default="scratch-low")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--imgsz", "--img-size", type=int, default=640)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--process-workers", action="store_true",
                   help="worker PROCESSES instead of threads for the train loader "
                   "(the reference's N-worker-process design; lifts the GIL ceiling "
                   "on multi-core hosts)")
    p.add_argument("--save-dir", "--project", type=str, default="runs/train/exp")
    p.add_argument("--cos-lr", action="store_true")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--val-every", type=int, default=1)
    p.add_argument("--noval", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--weights", type=str, default=None,
                   help="pretrained init from a .ckpt or reference .pt (finetune; "
                   "optimizer/EMA restart fresh — use --resume for exact continuation)")
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--multichip", action="store_true", help="data-parallel over all local devices")
    p.add_argument("--freeze", type=int, nargs="+", default=[], help="freeze layer indices (reference train.py:138-144)")
    p.add_argument("--multi-scale", action="store_true", help="random-resize batches over static buckets")
    p.add_argument(
        "--rect", action="store_true",
        help="rectangular training: aspect-ratio-bucketed batches on the smallest "
        "stride-aligned canvas (reference train.py:452, utils/dataloaders.py:544-567); "
        "disables mosaic and batch shuffling like the reference",
    )
    p.add_argument("--image-weights", action="store_true", help="sample images by per-class mAP deficit")
    p.add_argument("--noautoanchor", action="store_true")
    p.add_argument(
        "--accumulate", type=int, default=-1,
        help="micro-batches per optimizer step; -1 = auto max(round(64/bs),1), 1 = off (reference train.py:156)",
    )
    p.add_argument(
        "--evolve", type=int, nargs="?", const=30, default=None,
        help="evolve hyperparameters for N generations (reference train.py:546-636)",
    )
    return p.parse_args(argv)


def run_train(opt, hyp=None, save_dir=None, **overrides):
    mesh = make_mesh() if opt.multichip else None
    kwargs = dict(
        cfg=opt.cfg,
        data=opt.data,
        hyp=hyp if hyp is not None else opt.hyp,
        epochs=opt.epochs,
        batch_size=opt.batch_size,
        img_size=opt.imgsz,
        workers=opt.workers,
        process_workers=opt.process_workers,
        save_dir=save_dir or opt.save_dir,
        compute_dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
        cos_lr=opt.cos_lr,
        patience=opt.patience,
        val_every=opt.val_every,
        noval=opt.noval,
        seed=opt.seed,
        resume=opt.resume,
        weights=opt.weights,
        mesh=mesh,
        freeze=tuple(opt.freeze),
        multi_scale=opt.multi_scale,
        rect=opt.rect,
        image_weights=opt.image_weights,
        noautoanchor=opt.noautoanchor,
        accumulate=opt.accumulate,
    )
    kwargs.update(overrides)
    return train(**kwargs)


def main(argv=None):
    opt = parse_opt(argv)
    if opt.evolve:
        # GA over the hyp space: each generation is a short train run whose
        # fitness feeds parent selection (reference train.py:546-636)
        from ..train.evolve import evolve
        from ..train.trainer import load_hyp

        base_hyp = load_hyp(opt.hyp)
        gen = [0]

        def train_fn(hyp):
            gen[0] += 1
            best_fi, _, _ = run_train(opt, hyp=hyp, save_dir=f"{opt.save_dir}/gen{gen[0]}")
            return best_fi

        best = evolve(base_hyp, train_fn, generations=opt.evolve, save_dir=opt.save_dir, seed=opt.seed)
        print(f"evolved hyp: {best}")
        return best
    return run_train(opt)


if __name__ == "__main__":
    main()
