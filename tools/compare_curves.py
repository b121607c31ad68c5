"""Equal-epoch comparison of two training runs' results.csv.

Used to verify that the assembled current-HEAD training pipeline reproduces
the round-1 mAP trajectory (VERDICT r2 'what's missing' #4): same recipe,
same data, compared at the epochs both runs have reached.

Usage: python tools/compare_curves.py runs/lead-yolo-ssdd/results.csv \
           runs/retrain_r03/results.csv [--epochs 10 20 30 50 75 100]
"""
import argparse
import csv


def load(path):
    with open(path) as f:
        return {int(r["epoch"]): r for r in csv.DictReader(f)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("baseline")
    p.add_argument("candidate")
    p.add_argument("--epochs", type=int, nargs="+", default=None)
    a = p.parse_args()
    base, cand = load(a.baseline), load(a.candidate)
    last = max(cand)
    epochs = a.epochs or [e for e in (5, 10, 20, 30, 50, 75, 100, 150, 200, 299) if e <= last]
    if last not in epochs:
        epochs.append(last)

    print(f"| epoch | mAP50 (r1) | mAP50 (now) | mAP50-95 (r1) | mAP50-95 (now) |")
    print("|---|---|---|---|---|")
    for e in epochs:
        b, c = base.get(e), cand.get(e)
        if b is None or c is None:
            missing = " and ".join(
                n for n, d in (("baseline", b), ("candidate", c)) if d is None
            )
            print(f"| {e} | — epoch absent from {missing} csv — ||||")
            continue
        print(
            f"| {e} | {float(b['mAP50']):.4f} | {float(c['mAP50']):.4f} "
            f"| {float(b['mAP50-95']):.4f} | {float(c['mAP50-95']):.4f} |"
        )


if __name__ == "__main__":
    main()
