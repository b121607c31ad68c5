"""Hyperparameter evolution: GA over the 28-hyp space.

Capability parity with reference train.py:546-636: per-hyp mutation scales and
bounds, fitness-weighted parent selection from the top-5 survivors, 80%%
mutation probability with 0.2 sigma, results appended to evolve.csv, best
combination reported.
"""
from __future__ import annotations

import csv
import random
from pathlib import Path

import numpy as np

# (mutation scale, lower bound, upper bound) — reference train.py:548-577
HYP_META = {
    "lr0": (1, 1e-5, 1e-1),
    "lrf": (1, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1, 0.0, 0.001),
    "warmup_epochs": (1, 0.0, 5.0),
    "warmup_momentum": (1, 0.0, 0.95),
    "warmup_bias_lr": (1, 0.0, 0.2),
    "box": (1, 0.02, 0.2),
    "cls": (1, 0.2, 4.0),
    "cls_pw": (1, 0.5, 2.0),
    "obj": (1, 0.2, 4.0),
    "obj_pw": (1, 0.5, 2.0),
    "iou_t": (0, 0.1, 0.7),
    "anchor_t": (1, 2.0, 8.0),
    "fl_gamma": (0, 0.0, 2.0),
    "hsv_h": (1, 0.0, 0.1),
    "hsv_s": (1, 0.0, 0.9),
    "hsv_v": (1, 0.0, 0.9),
    "degrees": (1, 0.0, 45.0),
    "translate": (1, 0.0, 0.9),
    "scale": (1, 0.0, 0.9),
    "shear": (1, 0.0, 10.0),
    "perspective": (0, 0.0, 0.001),
    "flipud": (1, 0.0, 1.0),
    "fliplr": (0, 0.0, 1.0),
    "mosaic": (1, 0.0, 1.0),
    "mixup": (1, 0.0, 1.0),
    "copy_paste": (1, 0.0, 1.0),
}


def mutate(hyp: dict, history: list, rng=None, mp: float = 0.8, sigma: float = 0.2) -> dict:
    """One GA mutation step (reference train.py:585-607): select a parent by
    fitness-weighted choice over the top-5 results, then mutate."""
    rng = rng or np.random.default_rng()
    hyp = dict(hyp)
    if history:
        top = sorted(history, key=lambda r: -r[0])[:5]
        w = np.array([max(r[0], 1e-6) for r in top])
        parent = top[rng.choice(len(top), p=w / w.sum())][1]
        hyp.update(parent)

    keys = [k for k in HYP_META if k in hyp]
    g = np.array([HYP_META[k][0] for k in keys])
    v = np.ones(len(keys))
    while (v == 1).all():
        v = (g * (rng.random(len(keys)) < mp) * rng.standard_normal(len(keys)) * rng.random() * sigma + 1).clip(
            0.3, 3.0
        )
    for k, vi in zip(keys, v):
        lo, hi = HYP_META[k][1], HYP_META[k][2]
        hyp[k] = float(np.clip(float(hyp[k]) * vi, lo, hi))
    return hyp


def evolve(
    base_hyp: dict,
    train_fn,
    generations: int = 30,
    save_dir="runs/evolve",
    seed: int = 0,
    log_fn=print,
):
    """Run the GA: ``train_fn(hyp) -> fitness``. Returns the best hyp dict.

    Results append to evolve.csv like the reference (train.py:608-630).
    """
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    csv_path = save_dir / "evolve.csv"
    rng = np.random.default_rng(seed)
    history = []

    keys = [k for k in HYP_META if k in base_hyp]
    if not csv_path.exists():
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerow(["fitness"] + keys)

    for gen in range(generations):
        hyp = mutate(base_hyp, history, rng) if gen else dict(base_hyp)
        fi = float(train_fn(hyp))
        history.append((fi, {k: hyp[k] for k in keys}))
        with open(csv_path, "a", newline="") as f:
            csv.writer(f).writerow([f"{fi:.5f}"] + [f"{hyp[k]:.5g}" for k in keys])
        best = max(history, key=lambda r: r[0])
        log_fn(f"evolve gen {gen + 1}/{generations}: fitness {fi:.4f} (best {best[0]:.4f})")

    best_fi, best_hyp = max(history, key=lambda r: r[0])
    out = dict(base_hyp)
    out.update(best_hyp)
    return out
