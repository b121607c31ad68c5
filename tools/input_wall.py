"""Measure the host input pipeline alone (no device): can the augmenting
train loader feed a multi-chip step rate?

Times images/sec of the TRAIN path (mosaic + perspective warp + HSV + flips,
thread-pool Python+cv2, data/loader.py) and the EVAL fastpath (threaded
decode + native C++ letterbox) at several worker counts. SURVEY.md §7 hard
part 6: the reference solves this with N worker *processes*; our train path
is still GIL-bound threads — this tool records where that wall is.

    python tools/input_wall.py --data ssdd --batches 20
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(dl, max_batches):
    n_img = 0
    it = iter(dl)
    next(it)  # warm the caches / first mosaic pool
    t0 = time.perf_counter()
    for i, batch in enumerate(it):
        n_img += batch[0].shape[0]
        if i + 1 >= max_batches:
            break
    dt = time.perf_counter() - t0
    return n_img / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="ssdd")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", default="4,8,16")
    ap.add_argument("--tag", default="r04")
    ap.add_argument(
        "--step-imgs-per-sec", type=float, default=None,
        help="measured single-chip train-step consumption (tools/step_rate.py); "
        "when given, the artifact records the N-chip feeding verdict",
    )
    args = ap.parse_args()

    from leadyolo_tpu.data.datasets import YoloDataset
    from leadyolo_tpu.data.loader import DataLoader
    from leadyolo_tpu.train.trainer import load_hyp, resolve_data

    data_cfg = resolve_data(args.data)
    hyp = load_hyp("scratch-low")

    rows = []
    for w in (int(x) for x in args.workers.split(",")):
        ds = YoloDataset(data_cfg["train"], img_size=args.imgsz, batch_size=args.batch_size,
                         augment=True, hyp=hyp)
        dl = DataLoader(ds, args.batch_size, shuffle=True, workers=w)
        ips = measure(dl, args.batches)
        rows.append(("train-augment", w, round(ips, 1)))
        print(f"train-augment workers={w:>2}: {ips:7.1f} img/s", flush=True)

    for w in (int(x) for x in args.workers.split(",")):
        ds = YoloDataset(data_cfg["train"], img_size=args.imgsz, batch_size=args.batch_size,
                         augment=True, hyp=hyp)
        dl = DataLoader(ds, args.batch_size, shuffle=True, workers=w, use_processes=True)
        try:
            ips = measure(dl, args.batches)
        finally:
            dl.close()
        rows.append(("train-augment-proc", w, round(ips, 1)))
        print(f"train-augment-proc workers={w:>2}: {ips:7.1f} img/s", flush=True)

    for w in (int(x) for x in args.workers.split(",")):
        ds = YoloDataset(data_cfg["val"], img_size=args.imgsz, batch_size=args.batch_size,
                         augment=False, rect=False)
        dl = DataLoader(ds, args.batch_size, shuffle=False, workers=w)
        ips = measure(dl, args.batches)
        rows.append(("eval-native", w, round(ips, 1)))
        print(f"eval-native   workers={w:>2}: {ips:7.1f} img/s", flush=True)

    print("\n| path | workers | img/s |")
    print("|---|---|---|")
    for name, w, ips in rows:
        print(f"| {name} | {w} | {ips} |")

    import json

    result = {
        "imgsz": args.imgsz, "batch_size": args.batch_size, "batches": args.batches,
        # loader throughput scales with host cores; this container has
        # os.cpu_count() of them — per-sample ms x cores is the portable metric
        "host_cpu_count": os.cpu_count(),
        "rows": [{"path": n, "workers": w, "imgs_per_sec": i} for n, w, i in rows],
    }
    best_train = max((i for n, _, i in rows if n.startswith("train-augment")), default=0.0)
    if args.step_imgs_per_sec:
        result["step_imgs_per_sec"] = args.step_imgs_per_sec
        result["chips_fed_at_best_train_rate"] = round(best_train / args.step_imgs_per_sec, 2)
        print(f"\nfeeding verdict: loader {best_train} img/s / step {args.step_imgs_per_sec} "
              f"img/s/chip = {result['chips_fed_at_best_train_rate']} chips fed from one host")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "runs", "input_wall", f"INPUT_WALL_{args.tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
