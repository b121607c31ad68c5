"""Benchmarks sweep: export every supported format, then val each.

Capability parity with reference benchmarks.py:52-113: a table of
format / artifact size / mAP / inference time, with an optional --hard-fail
mAP floor that turns regressions into a nonzero exit (the reference's
numerical regression test).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from ..eval.validator import validate
from ..train.trainer import resolve_data
from .export import EXPORTERS, export_formats, run as export_run


def evaluate_artifact(art, data_cfg, ds, n_eval, cfg="lead-yolo", imgsz=640, batch=1):
    """Full-split mAP + latency of one exported artifact through MultiBackend.

    The single eval contract for the sweep (here) AND tools/int8_sweep.py —
    one implementation so the int8 quality numbers and the benchmark gate
    can never drift apart.  Returns {"map50", "map5095", "ms_per_img"}.
    """
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from ..models.backend import MultiBackend
    from ..ops.metrics import ap_per_class, process_batch
    from ..ops.nms import non_max_suppression

    iouv = np.linspace(0.5, 0.95, 10)
    backend = MultiBackend(art, cfg=cfg, nc=data_cfg["nc"], img_size=imgsz)
    backend.warmup((batch, imgsz, imgsz, 3))
    stats = []
    t_total = 0.0
    for i in range(0, n_eval, batch):
        ims, lbs = zip(*(ds[j] for j in range(i, min(i + batch, n_eval))))
        x = np.stack(ims)
        if len(x) < batch:
            x = np.concatenate([x, np.zeros((batch - len(x),) + x.shape[1:], x.dtype)])
        t0 = _time.perf_counter()
        preds = backend.forward(x)
        t_total += _time.perf_counter() - t0
        det, valid, _ = non_max_suppression(
            jnp.asarray(preds[: len(ims)], jnp.float32), conf_thres=0.001, iou_thres=0.6,
            multi_label=data_cfg["nc"] > 1, max_det=300, nc=data_cfg["nc"],
        )
        det, valid = np.asarray(det), np.asarray(valid)
        for k, lb in enumerate(lbs):
            d = det[k][valid[k]]
            tb = np.zeros((len(lb), 5), np.float32)
            if len(lb):
                tb[:, 0] = lb[:, 0]
                cx, cy, w, h = (lb[:, 1] * imgsz, lb[:, 2] * imgsz, lb[:, 3] * imgsz, lb[:, 4] * imgsz)
                tb[:, 1:] = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
            stats.append((process_batch(d, tb, iouv), d[:, 4], d[:, 5], tb[:, 0]))
    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pc = np.concatenate([s[2] for s in stats])
    tc = np.concatenate([s[3] for s in stats])
    m = ap_per_class(tp, conf, pc, tc) if len(tc) else None
    return {
        "map50": float(m["ap"][:, 0].mean()) if m is not None else 0.0,
        "map5095": float(m["ap_mean"].mean()) if m is not None else 0.0,
        "ms_per_img": t_total / n_eval * 1000,
    }


def run(weights, data="ssdd", cfg="lead-yolo", imgsz=640, batch=1, hard_fail=None,
        out_dir="runs/benchmarks", n_eval=None, int8=False):
    from ..data.datasets import YoloDataset

    data_cfg = resolve_data(data)
    rows = []
    artifacts = {"ckpt": weights}
    exported = export_run(
        weights,
        include=[a for _, a, _, ok in export_formats() if ok],
        cfg=cfg,
        imgsz=imgsz,
        batch=batch,
        out_dir=out_dir,
    )
    for (name, arg, suffix, ok), art in zip([f for f in export_formats() if f[3]], exported):
        if art:
            artifacts[arg] = art
    if int8:
        # int8 TFLite with a representative train-set calibration pass
        # (reference export.py:372-401) as an extra sweep row. Uses the
        # "8x8-split" flavor (full-integer backbone+heads, float decode at
        # load): the INT8_r04 sweep measured 0.6374 mAP50-95 vs 0.4528 for
        # in-graph decode — boxes never pass through a quantizer.
        from .export import run as export_int8_run

        i8 = export_int8_run(weights, include=["tflite"], cfg=cfg, imgsz=imgsz, batch=batch,
                             int8=True, data=data_cfg["train"], out_dir=str(Path(out_dir) / "int8"),
                             quant_mode="8x8-split")
        if i8 and i8[0]:
            artifacts["tflite-int8"] = i8[0]

    ds = YoloDataset(data_cfg["val"], img_size=imgsz, augment=False, max_targets=128)
    # default: the FULL val split (the reference's benchmarks.py:52-113 runs
    # full-split val per format); n_eval subsets only when asked
    n_eval = len(ds) if n_eval is None else min(n_eval, len(ds))

    for fmt, art in artifacts.items():
        try:
            r = evaluate_artifact(art, data_cfg, ds, n_eval, cfg=cfg, imgsz=imgsz, batch=batch)
            rows.append((fmt, str(art), round(r["map5095"], 4), round(r["ms_per_img"], 2)))
        except Exception as e:
            rows.append((fmt, str(art), None, None))
            print(f"benchmark {fmt}: FAILED ({e})")

    print(f"\n{'format':<14}{'mAP50-95':>10}{'ms/img':>10}  artifact")
    for fmt, art, mp, ms in rows:
        print(f"{fmt:<14}{str(mp):>10}{str(ms):>10}  {art}")

    if hard_fail is not None:
        # int8 rows get the reference CI's quantization floor (0.29,
        # ci-testing.yml benchmarks job) — full-int8 costs real mAP by design
        int8_floor = min(hard_fail, 0.29)
        failed = [
            (fmt, mp) for fmt, _, mp, _ in rows
            if mp is not None and mp < (int8_floor if "int8" in fmt else hard_fail)
        ]
        if failed:
            print(f"HARD FAIL: {failed} below floor {hard_fail} (int8 floor {int8_floor})")
            sys.exit(1)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--data", default="ssdd")
    p.add_argument("--cfg", default="lead-yolo")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--hard-fail", type=float, default=None)
    p.add_argument("--n-eval", type=int, default=None, help="subset size (default: full val split)")
    p.add_argument("--int8", action="store_true", help="add an int8 TFLite row (representative-dataset calibrated)")
    a = p.parse_args()
    run(a.weights, a.data, a.cfg, a.imgsz, a.batch, a.hard_fail, n_eval=a.n_eval, int8=a.int8)


if __name__ == "__main__":
    main()
