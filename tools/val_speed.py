"""Throughput at EVAL thresholds — the north-star metric as written.

BASELINE.md's target is COCO-val *eval* throughput (>=2000 img/s/chip), and
the reference's FPS contract is measured inside val.run at conf 0.001 /
IoU 0.6 / multi-label / max_nms (reference val.py:228-234, 301-306). bench.py
measures detect-time settings (conf 0.25, iou 0.45, max_nms 1024) where the
adaptive NMS takes its cheap K=256 path; THIS tool measures exactly what
eval/validator.py runs: rect-bucketed SSDD val batches, bf16 forward +
decode + NMS at val thresholds, timed with the same single-dispatch
lax.fori_loop harness as bench.py (the axon tunnel charges ~350 ms per
host dispatch; one dispatch of N on-device iterations times the chip).

Outputs runs/val_speed/VAL_SPEED_<tag>.json:
  per-bucket ms/batch + candidate-count stats, aggregate img/s over the real
  val distribution (each bucket weighted by its true batch count), and a
  side-by-side with the detect-time bench number.

Usage: python tools/val_speed.py [--batch 32] [--iters 50] [--tag r05]
       [--probe]   # only print per-image active-candidate counts and exit
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tag", type=str, default="r05")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--max-nms", type=int, default=4096)
    ap.add_argument("--probe", action="store_true",
                    help="report active-candidate counts per image, no timing")
    ap.add_argument("--no-rect", dest="rect", action="store_false")
    ap.add_argument("--cpu", action="store_true", help="debug on CPU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from leadyolo_tpu.cli.val import load_weights
    from leadyolo_tpu.data.datasets import YoloDataset
    from leadyolo_tpu.data.loader import DataLoader
    from leadyolo_tpu.ops.nms import non_max_suppression
    from leadyolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model, variables = load_weights(os.path.join(_REPO, "weights", "lead-yolo-ssdd.ckpt"),
                                    "lead-yolo")
    nc = model.nc

    ds = YoloDataset(
        "/root/reference/data/SSDD/images/test", img_size=640, augment=False,
        max_targets=128, rect=args.rect, batch_size=args.batch,
        pad=0.5 if args.rect else 0.0, return_shapes=True,
    )
    dl = DataLoader(ds, batch_size=args.batch, shuffle=False, drop_last=False, workers=8)

    # collect batches grouped by canvas shape (the validator's closed shape set)
    buckets: dict[tuple, list] = {}
    real_counts: dict[tuple, int] = {}
    for imgs, _t, _m, _metas in dl:
        b = imgs.shape[0]
        if b < args.batch:
            imgs = np.concatenate(
                [imgs, np.zeros((args.batch - b,) + imgs.shape[1:], imgs.dtype)])
        shp = imgs.shape[1:3]
        buckets.setdefault(shp, []).append(imgs)
        real_counts[shp] = real_counts.get(shp, 0) + b
    print(f"[val_speed] {sum(real_counts.values())} images in {len(buckets)} "
          f"rect buckets: { {s: len(v) for s, v in buckets.items()} }", flush=True)

    def infer(variables, images):
        """EXACTLY eval/validator.py's jitted fn: bf16 fwd + decode + val NMS."""
        x = images.astype(jnp.bfloat16) / 255.0
        preds = model.apply(variables, x, train=False, decode=True)
        if isinstance(preds, tuple):
            preds = preds[0]
        det, valid, _ = non_max_suppression(
            preds.astype(jnp.float32), conf_thres=args.conf, iou_thres=args.iou,
            multi_label=nc > 1, max_det=300, max_nms=args.max_nms, nc=nc,
        )
        return det, valid

    if args.probe:
        # per-image above-threshold candidate counts — decides which NMS
        # path (K budget) val-threshold data actually needs
        @jax.jit
        def count_actives(variables, images):
            x = images.astype(jnp.bfloat16) / 255.0
            preds = model.apply(variables, x, train=False, decode=True)
            if isinstance(preds, tuple):
                preds = preds[0]
            obj = preds[..., 4]
            if nc > 1:
                score = (preds[..., 5:5 + nc] * obj[..., None])
                score = jnp.where(obj[..., None] > args.conf, score, 0.0)
                return (score > args.conf).sum(axis=(1, 2))
            conf = preds[..., 5:5 + nc].max(-1) * obj
            return ((obj > args.conf) & (conf > args.conf)).sum(axis=1)

        counts = []
        for shp, blist in buckets.items():
            for imgs in blist:
                counts.append(np.asarray(count_actives(variables, jnp.asarray(imgs))))
        counts = np.concatenate(counts)[: sum(real_counts.values())]
        qs = np.percentile(counts, [0, 25, 50, 75, 90, 99, 100]).astype(int)
        print(f"[val_speed] active candidates/image at conf {args.conf}: "
              f"min/p25/p50/p75/p90/p99/max = {qs.tolist()}")
        print(f"  <=256: {(counts <= 256).mean():.1%}  <=512: {(counts <= 512).mean():.1%}  "
              f"<=1024: {(counts <= 1024).mean():.1%}  <=2048: {(counts <= 2048).mean():.1%}")
        return

    @jax.jit
    def bench_loop(variables, images, iters):
        """ONE dispatch running `iters` val-mode batches (same harness as
        bench.py: dynamic batch index + scalar carry, nothing DCE'd)."""
        nb = images.shape[0]

        def body(i, acc):
            batch = lax.dynamic_index_in_dim(images, i % nb, axis=0, keepdims=False)
            det, valid = infer(variables, batch)
            return acc + jnp.sum(valid).astype(jnp.float32) + jnp.sum(det[..., :4]) * 1e-9

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    rows = []
    total_time_per_pass = 0.0  # seconds to run the real val set once
    for shp, blist in sorted(buckets.items()):
        images = jax.device_put(np.stack(blist))
        t0 = time.perf_counter()
        float(bench_loop(variables, images, 1))  # compile + warmup
        t_compile = time.perf_counter() - t0
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(bench_loop(variables, images, args.iters))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ms_batch = best * 1000 / args.iters
        imgs_s = args.batch / (ms_batch / 1000)
        rows.append({
            "canvas": list(shp), "n_batches": len(blist), "real_images": real_counts[shp],
            "ms_per_batch": round(ms_batch, 2), "imgs_per_sec": round(imgs_s, 1),
            "compile_s": round(t_compile, 1),
        })
        total_time_per_pass += ms_batch / 1000 * len(blist)
        print(f"[val_speed] {shp}: {ms_batch:.2f} ms/batch ({imgs_s:.0f} img/s) "
              f"x {len(blist)} batches", flush=True)

    n_imgs = sum(real_counts.values())
    agg = n_imgs / total_time_per_pass
    out = {
        "metric": "lead-yolo_640px_val_threshold_throughput",
        "value": round(agg, 1),
        "unit": "images/sec/chip",
        "settings": {"conf": args.conf, "iou": args.iou, "multi_label": nc > 1,
                     "max_nms": args.max_nms, "max_det": 300, "batch": args.batch,
                     "rect": args.rect, "nc": nc},
        "images": n_imgs,
        "val_set_seconds_per_pass": round(total_time_per_pass, 4),
        "buckets": rows,
        "note": "device pipeline at EVAL thresholds (validator.py's exact infer fn), "
                "single-dispatch fori_loop timing; detect-time bench is bench.py",
    }
    dst = os.path.join(_REPO, "runs", "val_speed", f"VAL_SPEED_{args.tag}.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit")}))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
