"""Plotting: results curves, PR/F1 curves, confusion matrix, label stats,
batch mosaics, feature maps.

Capability parity with reference utils/plots.py (plot_results :489,
plot_labels :388, plot_images :231, feature_visualization :170) and
utils/metrics.py plot_pr_curve/plot_mc_curve (:460-503) /
ConfusionMatrix.plot (:186-215). Matplotlib 'Agg', save-to-file only.
"""
from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_results(csv_path, save_path=None):
    """results.csv -> results.png grid of loss/metric curves."""
    import csv as csvmod

    csv_path = Path(csv_path)
    with open(csv_path) as f:
        rows = list(csvmod.DictReader(f))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch", "time_s", "lr")]
    x = [int(r["epoch"]) for r in rows]
    fig, axes = plt.subplots(2, (len(keys) + 1) // 2, figsize=(3.5 * ((len(keys) + 1) // 2), 7), tight_layout=True)
    for ax, k in zip(axes.ravel(), keys):
        ax.plot(x, [float(r[k]) for r in rows], marker=".", linewidth=1, markersize=3)
        ax.set_title(k, fontsize=10)
    out = Path(save_path or csv_path.with_name("results.png"))
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_pr_curve(px, py, ap, save_path="pr_curve.png", names=None):
    """Per-class PR curves + mean (reference utils/metrics.py:460-478)."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.asarray(py)
    for i in range(py.shape[0]):
        label = f"{(names or {}).get(i, i)} {ap[i, 0]:.3f}" if py.shape[0] <= 20 else None
        ax.plot(px, py[i], linewidth=1, label=label)
    ax.plot(px, py.mean(0), linewidth=3, color="blue", label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=8)
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    return save_path


def plot_mc_curve(px, py, save_path="mc_curve.png", names=None, xlabel="Confidence", ylabel="Metric"):
    """Metric-confidence curves (F1/P/R vs conf; reference utils/metrics.py:481-503)."""
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.asarray(py)
    for i in range(py.shape[0]):
        ax.plot(px, py[i], linewidth=1)
    y = py.mean(0)
    ax.plot(px, y, linewidth=3, color="blue", label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=8)
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    return save_path


def plot_confusion_matrix(cm, names=None, save_path="confusion_matrix.png", normalize=True):
    """cm: ConfusionMatrix instance (reference utils/metrics.py:186-215)."""
    m = cm.matrix.copy()
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    nc = cm.nc
    labels = [str((names or {}).get(i, i)) for i in range(nc)] + ["background"]
    fig, ax = plt.subplots(1, 1, figsize=(8, 7), tight_layout=True)
    im = ax.imshow(m, cmap="Blues", vmin=0)
    fig.colorbar(im)
    ax.set_xticks(range(nc + 1), labels, rotation=90, fontsize=8)
    ax.set_yticks(range(nc + 1), labels, fontsize=8)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    if nc < 30:
        for i in range(nc + 1):
            for j in range(nc + 1):
                if m[i, j] > 0.005:
                    ax.text(j, i, f"{m[i, j]:.2f}", ha="center", va="center", fontsize=7)
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    return save_path


def plot_labels(labels, names=None, save_path="labels.png"):
    """Label statistics: class histogram + box center/size distributions
    (reference utils/plots.py:388-426). labels (n,5) cls,xywh-normalized."""
    labels = np.asarray(labels)
    fig, axes = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    nc = int(labels[:, 0].max()) + 1 if len(labels) else 1
    axes[0, 0].hist(labels[:, 0], bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xlabel("class")
    axes[0, 1].scatter(labels[:, 1], labels[:, 2], s=3, alpha=0.4)
    axes[0, 1].set_xlabel("x")
    axes[0, 1].set_ylabel("y")
    axes[1, 0].scatter(labels[:, 3], labels[:, 4], s=3, alpha=0.4)
    axes[1, 0].set_xlabel("width")
    axes[1, 0].set_ylabel("height")
    axes[1, 1].hist2d(labels[:, 3], labels[:, 4], bins=50, cmap="Blues")
    axes[1, 1].set_xlabel("width")
    axes[1, 1].set_ylabel("height")
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path


def plot_images(images, targets=None, tmask=None, save_path="batch.png", max_images=16, names=None):
    """Training-batch mosaic with drawn boxes (reference utils/plots.py:231-329).

    images (B,H,W,3) uint8 RGB; targets (B,T,5) cls+xywh-normalized.
    """
    import cv2

    b = min(len(images), max_images)
    ns = int(np.ceil(b**0.5))
    h, w = images.shape[1:3]
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(b):
        r, c = divmod(i, ns)
        im = images[i][:, :, ::-1].copy()  # RGB->BGR for cv2 drawing
        if targets is not None:
            rows = targets[i][tmask[i]] if tmask is not None else targets[i]
            for cls, cx, cy, bw, bh in rows:
                x1 = int((cx - bw / 2) * w)
                y1 = int((cy - bh / 2) * h)
                x2 = int((cx + bw / 2) * w)
                y2 = int((cy + bh / 2) * h)
                cv2.rectangle(im, (x1, y1), (x2, y2), (0, 160, 255), 1)
        mosaic[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    cv2.imwrite(str(save_path), mosaic)
    return save_path


def feature_visualization(x, module_name, save_dir="runs/features", n=32):
    """Save a grid of feature-map channels (reference utils/plots.py:170-197).

    x: (B, H, W, C) activation (NHWC).
    """
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    x = np.asarray(x)
    if x.ndim != 4 or x.shape[1] == 1:
        return None
    c = min(n, x.shape[-1])
    cols = 8
    rows = int(np.ceil(c / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.5, rows * 1.5), tight_layout=True)
    for i, ax in enumerate(np.atleast_1d(axes).ravel()):
        ax.axis("off")
        if i < c:
            ax.imshow(x[0, :, :, i], cmap="viridis")
    out = save_dir / f"{module_name}_features.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out
