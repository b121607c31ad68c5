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


if __name__ == "__main__":
    main()
