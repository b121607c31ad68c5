"""Late-training photometric A/B — diagnosing the retrain's -0.009 tail.

Round-4 verdict weak #1: the full retrain tracks the committed r1 curve
through epoch 150, then trails at every later sample (mAP50-95 -0.009 at
299). Git archaeology pins the one recipe delta: the committed r1 run
(runs/lead-yolo-ssdd, trained at e3ec11e) predates commit 101a679, which
added the photometric corruption stage (blur/median/gray/CLAHE, p=0.01
each) AND its 4 rng draws per image — so the retrain both regularizes
harder and walks a shifted downstream augment stream.

This experiment isolates the late-training regime directly: finetune the
committed flagship checkpoint (weights/lead-yolo-ssdd.ckpt, r1 epoch-299
EMA) for N epochs at tail LR in two arms that differ ONLY in
hyp.photometric_p (0.01 vs 0.0 — p=0 removes the stage and its rng draws,
reproducing the r1 recipe's stream). Same seed, same everything else.
Output: runs/photometric_ab_r05/{on,off}/results.csv + AB.md comparison.

    python tools/photometric_ab.py --epochs 25
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arms", default="on,off")
    args = ap.parse_args()

    from leadyolo_tpu.train.trainer import load_hyp, train

    out_root = Path(_REPO) / "runs" / "photometric_ab_r05"
    # tail-of-run LR: the linear schedule at epoch ~290/300 gives
    # lr = lr0 * ((1 - 290/300) * (1 - lrf) + lrf) = 0.01 * 0.043 = 4.3e-4,
    # decaying toward the end-of-run 1e-4 across the arm (lrf 0.25)
    for arm in args.arms.split(","):
        hyp = dict(load_hyp("scratch-low"))
        hyp["lr0"] = 4.3e-4
        hyp["lrf"] = 0.25
        hyp["warmup_epochs"] = 0.0
        hyp["photometric_p"] = 0.01 if arm == "on" else 0.0
        save_dir = out_root / arm
        print(f"[photometric_ab] arm={arm} photometric_p={hyp['photometric_p']} "
              f"-> {save_dir}", flush=True)
        train(
            cfg="lead-yolo", data="ssdd", hyp=hyp, epochs=args.epochs,
            batch_size=args.batch, img_size=640, save_dir=save_dir,
            weights=os.path.join(_REPO, "weights", "lead-yolo-ssdd.ckpt"),
            seed=args.seed, noautoanchor=True, loggers=("csv",),
        )

    # summarize
    import csv

    def col(path, key):
        rows = list(csv.DictReader(open(path)))
        return [float(r[key]) for r in rows]

    res = {}
    for arm in args.arms.split(","):
        p = out_root / arm / "results.csv"
        if p.exists():
            res[arm] = {"map5095": col(p, "mAP50-95"), "map50": col(p, "mAP50")}
    if len(res) == 2:
        on, off = res["on"]["map5095"], res["off"]["map5095"]
        n = min(len(on), len(off))
        import numpy as np

        summary = {
            "epochs": n,
            "mean_map5095_on": round(float(np.mean(on[:n])), 5),
            "mean_map5095_off": round(float(np.mean(off[:n])), 5),
            "delta_off_minus_on": round(float(np.mean(off[:n]) - np.mean(on[:n])), 5),
            "final_on": round(on[n - 1], 5), "final_off": round(off[n - 1], 5),
        }
        (out_root / "AB_SUMMARY.json").write_text(json.dumps(summary, indent=1))
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
