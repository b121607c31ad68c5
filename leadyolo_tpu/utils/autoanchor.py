"""AutoAnchor: BPR check + k-means/genetic anchor evolution.

Capability parity with reference utils/autoanchor.py:19-169: the
best-possible-recall metric over the training labels, and when BPR <= the
threshold, k-means-seeded anchors evolved by a 1000-generation mutation loop
under the same fitness (mean best-ratio above 1/anchor_t).
"""
from __future__ import annotations

import numpy as np


def anchor_metric(anchors: np.ndarray, wh: np.ndarray, thr: float = 4.0):
    """(bpr, aat): best-possible recall and anchors-above-threshold
    (reference utils/autoanchor.py:38-44). wh in pixels, anchors (n,2)."""
    r = wh[:, None] / anchors[None]
    x = np.minimum(r, 1 / r).min(2)  # ratio metric per (label, anchor)
    best = x.max(1)
    aat = (x > 1 / thr).sum(1).mean()
    bpr = (best > 1 / thr).mean()
    return float(bpr), float(aat)


def _fitness(anchors, wh, thr):
    r = wh[:, None] / anchors[None]
    x = np.minimum(r, 1 / r).min(2)
    best = x.max(1)
    return (best * (best > 1 / thr)).mean()


def kmean_anchors(wh: np.ndarray, n: int = 9, img_size: int = 640, thr: float = 4.0, gen: int = 1000, seed: int = 0):
    """k-means init + genetic evolution (reference utils/autoanchor.py:73-169).

    wh: (m, 2) label sizes in pixels at train scale. Returns (n, 2) anchors
    sorted by area.
    """
    from scipy.cluster.vq import kmeans

    rng = np.random.default_rng(seed)
    wh = wh[(wh >= 2.0).any(1)]  # filter tiny (reference filters < 2px)
    s = wh.std(0)
    try:
        k, _ = kmeans(wh / s, n, iter=30, seed=seed)
        assert k.shape == (n, 2)
        k *= s
    except Exception:
        k = np.sort(rng.random((n, 2)), 0) * img_size  # random fallback

    f = _fitness(k, wh, thr)
    sh = k.shape
    mp, sigma = 0.9, 0.1  # mutation probability, sigma (reference :152)
    for _ in range(gen):
        v = np.ones(sh)
        while (v == 1).all():
            v = ((rng.random(sh) < mp) * rng.random() * rng.standard_normal(sh) * sigma + 1).clip(0.3, 3.0)
        kg = (k * v).clip(2.0, None)
        fg = _fitness(kg, wh, thr)
        if fg > f:
            f, k = fg, kg.copy()
    return k[np.argsort(k.prod(1))]


def dataset_wh(dataset, img_size: int = 640):
    """Label wh in pixels at train scale, with the reference's random jitter
    (reference utils/autoanchor.py:51: scale 0.9-1.1)."""
    rng = np.random.default_rng(0)
    whs = []
    for i in range(len(dataset)):
        lb = dataset.labels[i]
        if len(lb):
            # assume square letterbox to img_size (shapes normalized)
            scale = rng.uniform(0.9, 1.1)
            whs.append(lb[:, 3:5] * img_size * scale)
    return np.concatenate(whs, 0) if whs else np.zeros((0, 2))


def check_anchors(dataset, model, thr: float = 4.0, imgsz: int = 640, log_fn=print):
    """BPR gate + re-evolution when below 0.98 (reference utils/autoanchor.py:30-70).

    Returns possibly-updated anchors_px (nl, na, 2); caller rebuilds the
    model wrapper's anchor constants.
    """
    wh = dataset_wh(dataset, imgsz)
    anchors_px = model.anchors_px.reshape(-1, 2)
    bpr, aat = anchor_metric(anchors_px, wh, thr)
    log_fn(f"autoanchor: {aat:.2f} anchors/target, {bpr:.3f} best possible recall")
    if bpr > 0.98:
        return model.anchors_px
    log_fn("autoanchor: BPR below 0.98, evolving new anchors...")
    na = anchors_px.shape[0]
    new = kmean_anchors(wh, n=na, img_size=imgsz, thr=thr)
    new_bpr, _ = anchor_metric(new, wh, thr)
    if new_bpr > bpr:
        log_fn(f"autoanchor: improved BPR {bpr:.3f} -> {new_bpr:.3f}")
        return new.reshape(model.anchors_px.shape)
    log_fn("autoanchor: original anchors retained")
    return model.anchors_px
