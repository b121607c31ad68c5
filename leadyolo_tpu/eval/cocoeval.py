"""First-party COCO-style detection evaluation — pure numpy, no pycocotools.

Implements the published COCO bbox protocol (the algorithm behind
pycocotools.cocoeval.COCOeval, re-derived from its specification): per
(image, category) greedy score-ordered matching with crowd/area-range ignore
semantics, accumulation over 10 IoU thresholds x 101 recall points x 4 area
ranges x 3 maxDets, and the standard 12-number summary.

The reference repo shells out to pycocotools when --save-json is set
(reference val.py:313-336) and simply crashes if it isn't installed; here the
evaluator is first-party so `val.py --save-json` always produces COCO mAP.
Cross-checked against ops/metrics.ap_per_class (the 101-pt interpolated
all-area AP agrees on crowd-free data) and hand-computed goldens in
tests/test_cocoeval.py.

Inputs are plain record dicts:
  gt: {image_id, category_id, bbox [x,y,w,h], area?, iscrowd?}
  dt: {image_id, category_id, bbox [x,y,w,h], score}
exactly the JSON schema eval/validator.py writes.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """(D,4),(G,4) corner-xywh -> (D,G) IoU; crowd GTs use inter/area(dt)
    (a detection inside a crowd region is not penalized for covering only
    part of it — the COCO crowd convention)."""
    d = np.asarray(dt, np.float64)
    g = np.asarray(gt, np.float64)
    if d.size == 0 or g.size == 0:
        return np.zeros((d.shape[0], g.shape[0]))
    dx1, dy1 = d[:, 0:1], d[:, 1:2]
    dx2, dy2 = d[:, 0:1] + d[:, 2:3], d[:, 1:2] + d[:, 3:4]
    gx1, gy1 = g[None, :, 0], g[None, :, 1]
    gx2, gy2 = g[None, :, 0] + g[None, :, 2], g[None, :, 1] + g[None, :, 3]
    iw = np.clip(np.minimum(dx2, gx2) - np.maximum(dx1, gx1), 0, None)
    ih = np.clip(np.minimum(dy2, gy2) - np.maximum(dy1, gy1), 0, None)
    inter = iw * ih
    darea = (d[:, 2] * d[:, 3])[:, None]
    garea = (g[:, 2] * g[:, 3])[None, :]
    union = np.where(iscrowd[None, :].astype(bool), darea, darea + garea - inter)
    return inter / np.maximum(union, 1e-12)


class COCOeval:
    """Evaluate detection records against ground-truth records.

    eval = COCOeval(gt_records, dt_records).run()
    eval.stats -> the standard 12 numbers; eval.summarize() prints them.
    """

    def __init__(self, gt: list[dict], dt: list[dict]):
        self.img_ids = sorted({g["image_id"] for g in gt} | {d["image_id"] for d in dt},
                              key=str)
        self.cat_ids = sorted({g["category_id"] for g in gt} | {d["category_id"] for d in dt})
        self._gt = {}
        self._dt = {}
        for g in gt:
            g = dict(g)
            g.setdefault("iscrowd", 0)
            g.setdefault("area", float(g["bbox"][2] * g["bbox"][3]))
            self._gt.setdefault((g["image_id"], g["category_id"]), []).append(g)
        for d in dt:
            self._dt.setdefault((d["image_id"], d["category_id"]), []).append(d)
        self.stats = None
        self.eval = None

    # ---- per-(image, category) matching ----

    def _evaluate_img(self, img_id, cat_id, area_rng, max_det):
        gts = self._gt.get((img_id, cat_id), [])
        dts = self._dt.get((img_id, cat_id), [])
        if not gts and not dts:
            return None
        # GT ignore: crowds and out-of-area-range boxes still participate in
        # matching (a dt matched to one is neither TP nor FP) but don't count
        # toward npig, the recall denominator
        # inclusive [lo, hi] boundaries — the protocol's convention
        g_ignore = np.array(
            [bool(g["iscrowd"]) or g["area"] < area_rng[0] or g["area"] > area_rng[1]
             for g in gts],
            dtype=bool,
        )
        # unignored GTs first: the greedy loop then prefers real matches and
        # falls through to ignored ones only when no real GT remains
        g_order = np.argsort(g_ignore, kind="stable")
        gts = [gts[i] for i in g_order]
        g_ignore = g_ignore[g_order]
        d_order = np.argsort([-d["score"] for d in dts], kind="stable")[:max_det]
        dts = [dts[i] for i in d_order]

        ious = iou_xywh(
            np.array([d["bbox"] for d in dts], np.float64).reshape(-1, 4),
            np.array([g["bbox"] for g in gts], np.float64).reshape(-1, 4),
            np.array([g["iscrowd"] for g in gts], bool).reshape(-1),
        )
        T, D, G = len(IOU_THRS), len(dts), len(gts)
        dtm = -np.ones((T, D), np.int64)  # matched gt index or -1
        gtm = -np.ones((T, G), np.int64)
        for ti, t in enumerate(IOU_THRS):
            for di in range(D):
                best, best_iou = -1, min(t, 1 - 1e-10)
                for gi in range(G):
                    if gtm[ti, gi] >= 0 and not gts[gi]["iscrowd"]:
                        continue  # taken (crowds may absorb many dts)
                    # already have a real match and this gt is ignored: stop —
                    # gts are sorted real-first, only ignored ones remain
                    if best > -1 and not g_ignore[best] and g_ignore[gi]:
                        break
                    if ious[di, gi] >= best_iou:
                        best_iou = ious[di, gi]
                        best = gi
                if best >= 0:
                    dtm[ti, di] = best
                    gtm[ti, best] = di
        # dt ignore: matched to an ignored gt, or unmatched and itself outside
        # the area range (it couldn't have matched anything countable)
        d_area = np.array([d["bbox"][2] * d["bbox"][3] for d in dts], np.float64).reshape(-1)
        d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
        d_ignore = np.zeros((T, D), bool)
        for ti in range(T):
            m = dtm[ti]
            if G:
                d_ignore[ti] = np.where(m >= 0, g_ignore[np.maximum(m, 0)], d_out)
            else:
                d_ignore[ti] = d_out  # no gts: every dt is unmatched
        return {
            "scores": np.array([d["score"] for d in dts], np.float64),
            "matched": dtm >= 0,
            "d_ignore": d_ignore,
            "npig": int((~g_ignore).sum()),
        }

    # ---- accumulation ----

    def run(self):
        """Match + accumulate. Fills self.eval['precision'] with shape
        (T=10 iou, R=101 recall, K=cats, A=4 areas, M=3 maxDets) and
        ['recall'] with (T, K, A, M); then self.stats."""
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(AREA_RNG), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))
        max_det_cap = max(MAX_DETS)
        for ki, cat in enumerate(self.cat_ids):
            for ai, rng in enumerate(AREA_RNG.values()):
                per_img = [self._evaluate_img(i, cat, rng, max_det_cap) for i in self.img_ids]
                per_img = [e for e in per_img if e is not None]
                if not per_img:
                    continue
                npig = sum(e["npig"] for e in per_img)
                if npig == 0:
                    continue
                for mi, md in enumerate(MAX_DETS):
                    sc = np.concatenate([e["scores"][:md] for e in per_img])
                    order = np.argsort(-sc, kind="mergesort")  # stable, pycocotools tie rule
                    sc = sc[order]
                    matched = np.concatenate([e["matched"][:, :md] for e in per_img], 1)[:, order]
                    ign = np.concatenate([e["d_ignore"][:, :md] for e in per_img], 1)[:, order]
                    tps = matched & ~ign
                    fps = ~matched & ~ign
                    tp_c = tps.cumsum(1).astype(np.float64)
                    fp_c = fps.cumsum(1).astype(np.float64)
                    for ti in range(T):
                        tp, fp = tp_c[ti], fp_c[ti]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                        # precision envelope: monotone non-increasing from the right
                        q = np.zeros(R)
                        ss = np.zeros(R)
                        pr = np.maximum.accumulate(pr[::-1])[::-1]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        ok = inds < nd
                        q[ok] = pr[inds[ok]]
                        ss[ok] = sc[inds[ok]]
                        precision[ti, :, ki, ai, mi] = q
                        scores[ti, :, ki, ai, mi] = ss
        self.eval = {"precision": precision, "recall": recall, "scores": scores}
        self.stats = self._summarize_stats()
        return self

    def _sel(self, what, iou=None, area="all", max_det=100):
        x = self.eval[what]
        ai = list(AREA_RNG).index(area)
        mi = MAX_DETS.index(max_det)
        x = x[..., ai, mi]
        if iou is not None:
            x = x[np.isclose(IOU_THRS, iou).argmax()][None]
        x = x[x > -1]
        return float(x.mean()) if x.size else -1.0

    def _summarize_stats(self):
        return np.array([
            self._sel("precision"),                       # AP @[.5:.95]
            self._sel("precision", iou=0.5),              # AP50
            self._sel("precision", iou=0.75),             # AP75
            self._sel("precision", area="small"),
            self._sel("precision", area="medium"),
            self._sel("precision", area="large"),
            self._sel("recall", max_det=1),               # AR@1
            self._sel("recall", max_det=10),              # AR@10
            self._sel("recall"),                          # AR@100
            self._sel("recall", area="small"),
            self._sel("recall", area="medium"),
            self._sel("recall", area="large"),
        ])

    def summarize(self, print_fn=print):
        names = [
            ("Average Precision  (AP)", "0.50:0.95", "all", 100),
            ("Average Precision  (AP)", "0.50", "all", 100),
            ("Average Precision  (AP)", "0.75", "all", 100),
            ("Average Precision  (AP)", "0.50:0.95", "small", 100),
            ("Average Precision  (AP)", "0.50:0.95", "medium", 100),
            ("Average Precision  (AP)", "0.50:0.95", "large", 100),
            ("Average Recall     (AR)", "0.50:0.95", "all", 1),
            ("Average Recall     (AR)", "0.50:0.95", "all", 10),
            ("Average Recall     (AR)", "0.50:0.95", "all", 100),
            ("Average Recall     (AR)", "0.50:0.95", "small", 100),
            ("Average Recall     (AR)", "0.50:0.95", "medium", 100),
            ("Average Recall     (AR)", "0.50:0.95", "large", 100),
        ]
        for v, (label, iou, area, md) in zip(self.stats, names):
            print_fn(f" {label} @[ IoU={iou:9s} | area={area:6s} | maxDets={md:3d} ] = {v:0.3f}")
        return self.stats


def gt_from_yolo_dataset(ds) -> list[dict]:
    """Ground-truth records in NATIVE image space from a YoloDataset — the
    counterpart of the validator's save_one_json letterbox undo, so the
    evaluator needs no instances_*.json (the reference requires one,
    val.py:315). image_id follows the validator's rule: numeric stem -> int."""
    from pathlib import Path

    out = []
    for f, lb, (w0, h0) in zip(ds.im_files, ds.labels, ds.shapes):
        stem = Path(f).stem
        image_id = int(stem) if stem.isnumeric() else stem
        for cls, cx, cy, w, h in np.asarray(lb, np.float64).reshape(-1, 5):
            bw, bh = w * w0, h * h0
            out.append({
                "image_id": image_id,
                "category_id": int(cls),
                "bbox": [cx * w0 - bw / 2, cy * h0 - bh / 2, bw, bh],
            })
    return out


def evaluate_json(dt_records_or_path, dataset=None, gt_records=None, print_fn=print):
    """COCO mAP from the validator's JSON records (reference val.py:313-336
    equivalent, no pycocotools). Pass either a live YoloDataset (GT built in
    native space) or explicit gt_records. Returns the 12-number stats array."""
    import json
    from pathlib import Path

    dt = dt_records_or_path
    if isinstance(dt, (str, Path)):
        dt = json.loads(Path(dt).read_text())
    if gt_records is None:
        if dataset is None:
            raise ValueError("need dataset or gt_records for ground truth")
        gt_records = gt_from_yolo_dataset(dataset)
    ev = COCOeval(gt_records, dt).run()
    ev.summarize(print_fn)
    return ev.stats
