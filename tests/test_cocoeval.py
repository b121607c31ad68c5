"""First-party COCO evaluator: hand-computed goldens, protocol semantics
(crowd, area ranges, maxDets), cross-check vs ops/metrics.ap_per_class, and
the YoloDataset ground-truth builder."""
import numpy as np

from leadyolo_tpu.eval.cocoeval import COCOeval, gt_from_yolo_dataset, iou_xywh

AP, AP50, AP75, APS, APM, APL, AR1, AR10, AR100, ARS, ARM, ARL = range(12)


def _gt(img, cat, bbox, **kw):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), **kw}


def _dt(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "score": score}


def test_perfect_detections_are_ap_1():
    gt = [_gt(1, 0, (10, 10, 50, 40)), _gt(1, 0, (200, 50, 30, 30)), _gt(2, 1, (5, 5, 100, 100))]
    dt = [_dt(g["image_id"], g["category_id"], g["bbox"], 0.9) for g in gt]
    ev = COCOeval(gt, dt).run()
    assert np.isclose(ev.stats[AP], 1.0)
    assert np.isclose(ev.stats[AP50], 1.0)
    assert np.isclose(ev.stats[AR100], 1.0)


def test_hand_computed_ap50_golden():
    """1 image, 2 GTs, 3 dts (match, FP, match by score order):
    tp=[1,0,1] -> rc=[.5,.5,1], pr=[1,.5,2/3], envelope [1,2/3,2/3];
    101-pt sample: 51 points at 1.0 (r<=0.50), 50 at 2/3.
    AP50 = (51 + 50*2/3)/101 = 0.8349834...  (exact protocol arithmetic)"""
    gt = [_gt(1, 0, (0, 0, 10, 10)), _gt(1, 0, (100, 100, 10, 10))]
    dt = [
        _dt(1, 0, (0, 0, 10, 10), 0.9),       # IoU 1.0 with gt A
        _dt(1, 0, (50, 50, 10, 10), 0.8),     # matches nothing -> FP
        _dt(1, 0, (100, 100, 10, 10), 0.7),   # IoU 1.0 with gt B
    ]
    ev = COCOeval(gt, dt).run()
    expected = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    assert np.isclose(ev.stats[AP50], expected), (ev.stats[AP50], expected)
    # all IoU thresholds see the same matches (IoUs are exactly 1.0)
    assert np.isclose(ev.stats[AP], expected)


def test_low_iou_match_counts_only_below_threshold():
    """dt-vs-gt IoU ~0.569 (shifted box): TP at IoU .5/.55, FP at .6+."""
    gt = [_gt(1, 0, (0, 0, 20, 20))]
    dt = [_dt(1, 0, (5.5, 0, 20, 20), 0.9)]
    iou = iou_xywh(np.array([dt[0]["bbox"]]), np.array([gt[0]["bbox"]]), np.zeros(1))[0, 0]
    assert 0.55 < iou < 0.6
    ev = COCOeval(gt, dt).run()
    assert np.isclose(ev.stats[AP50], 1.0)
    assert np.isclose(ev.stats[AP75], 0.0)
    assert np.isclose(ev.stats[AP], 2.0 / 10.0)  # 2 of 10 thresholds pass


def test_crowd_gt_absorbs_without_fp():
    """A dt covering part of a crowd region: crowd IoU = inter/area(dt) = 1.0
    -> matched to the ignored crowd gt -> neither TP nor FP; the real gt
    still sets the recall denominator."""
    gt = [_gt(1, 0, (0, 0, 100, 100), iscrowd=1), _gt(1, 0, (200, 0, 10, 10))]
    dt = [
        _dt(1, 0, (10, 10, 20, 20), 0.9),   # inside the crowd (IoU-crowd 1.0)
        _dt(1, 0, (200, 0, 10, 10), 0.8),   # matches the real gt
    ]
    ev = COCOeval(gt, dt).run()
    # one real gt, matched -> perfect AP despite the crowd-absorbed dt
    assert np.isclose(ev.stats[AP], 1.0)
    assert np.isclose(ev.stats[AR100], 1.0)


def test_area_ranges_partition():
    """A 10x10 (small) and a 500x500 (large) gt, both matched: area-sliced
    AP sees only its own boxes; medium has none -> -1."""
    gt = [_gt(1, 0, (0, 0, 10, 10)), _gt(1, 0, (100, 100, 500, 500))]
    dt = [_dt(1, 0, (0, 0, 10, 10), 0.9), _dt(1, 0, (100, 100, 500, 500), 0.8)]
    ev = COCOeval(gt, dt).run()
    assert np.isclose(ev.stats[APS], 1.0)
    assert np.isclose(ev.stats[APL], 1.0)
    assert ev.stats[APM] == -1.0  # no medium gt anywhere
    assert np.isclose(ev.stats[AP], 1.0)


def test_maxdets_1_caps_recall():
    gt = [_gt(1, 0, (0, 0, 10, 10)), _gt(1, 0, (100, 100, 10, 10))]
    dt = [_dt(1, 0, (0, 0, 10, 10), 0.9), _dt(1, 0, (100, 100, 10, 10), 0.8)]
    ev = COCOeval(gt, dt).run()
    assert np.isclose(ev.stats[AR1], 0.5)   # only the top-score dt counts
    assert np.isclose(ev.stats[AR10], 1.0)


def test_duplicate_detection_is_fp():
    """Two dts on one gt: the higher-score one matches, the duplicate is FP
    (gt already taken) -> AP = sampled precision of tp=[1,0]."""
    gt = [_gt(1, 0, (0, 0, 10, 10))]
    dt = [_dt(1, 0, (0, 0, 10, 10), 0.9), _dt(1, 0, (0, 0, 10, 10), 0.5)]
    ev = COCOeval(gt, dt).run()
    # rc=[1,1], pr=[1,.5] -> envelope [1,.5]; searchsorted(left) hits idx 0
    # for every recall threshold -> q=1.0 everywhere
    assert np.isclose(ev.stats[AP], 1.0)


def test_cross_check_vs_ap_per_class():
    """Cross-check the COCO-protocol AP against ops/metrics.ap_per_class.

    The two published protocols differ in the PR-curve TAIL: YOLO's
    compute_ap appends a (recall 1, precision 0) sentinel and
    trapezoid-integrates across the never-reached recall region (adding
    ~(1-max_recall)*p_end/2 of area), while COCO samples the step envelope
    and scores 0 beyond achieved recall. At ~full recall the tail vanishes
    and the two must agree to interpolation noise — that's the regime this
    cross-check pins (at 85% detection rate the gap is a real ~0.06, and
    the matchers still agree on TP counts — verified during bring-up)."""
    from leadyolo_tpu.ops.metrics import ap_per_class, process_batch

    rng = np.random.default_rng(0)
    iouv = np.linspace(0.5, 0.95, 10)
    gt_recs, dt_recs, stats = [], [], []
    for img in range(30):
        n_gt = rng.integers(2, 6)
        boxes = np.stack([
            rng.uniform(0, 500, n_gt), rng.uniform(0, 500, n_gt),
            rng.uniform(40, 90, n_gt), rng.uniform(40, 90, n_gt),
        ], 1)
        cls = rng.integers(0, 2, n_gt)
        for b, c in zip(boxes, cls):
            gt_recs.append(_gt(img, int(c), b.tolist()))
        # detections: jittered copies of EVERY gt (full recall) + some junk
        dets = []
        for b, c in zip(boxes, cls):
            jit = b + rng.normal(0, 3, 4)
            jit[2:] = np.maximum(jit[2:], 5)
            dets.append((jit, int(c), float(rng.uniform(0.3, 1.0))))
        for _ in range(rng.integers(0, 3)):
            junk = np.array([rng.uniform(0, 500), rng.uniform(0, 500),
                             rng.uniform(40, 90), rng.uniform(40, 90)])
            dets.append((junk, int(rng.integers(0, 2)), float(rng.uniform(0.05, 0.6))))
        det_arr = np.zeros((len(dets), 6), np.float32)
        for i, (b, c, s) in enumerate(dets):
            det_arr[i] = [b[0], b[1], b[0] + b[2], b[1] + b[3], s, c]
            dt_recs.append(_dt(img, c, b.tolist(), s))
        det_arr = det_arr[det_arr[:, 4].argsort()[::-1]]
        lab = np.zeros((n_gt, 5), np.float32)
        lab[:, 0] = cls
        lab[:, 1:3] = boxes[:, :2]
        lab[:, 3:5] = boxes[:, :2] + boxes[:, 2:]
        stats.append((process_batch(det_arr, lab, iouv), det_arr[:, 4], det_arr[:, 5], lab[:, 0]))

    ev = COCOeval(gt_recs, dt_recs).run()
    r = ap_per_class(
        np.concatenate([s[0] for s in stats]),
        np.concatenate([s[1] for s in stats]),
        np.concatenate([s[2] for s in stats]),
        np.concatenate([s[3] for s in stats]),
    )
    assert abs(ev.stats[AP50] - float(r["ap50"].mean())) < 0.02
    # at IoU .8-.95 the jittered boxes stop matching, recall < 1 and the
    # protocols' tail divergence reappears — hence the looser bound here
    assert abs(ev.stats[AP] - float(r["ap_mean"].mean())) < 0.045


def test_gt_from_yolo_dataset_native_space(tmp_path):
    """GT builder undoes YOLO normalization into native pixel space; perfect
    native-space detections then score AP 1.0 — the exact contract of the
    validator's save_one_json letterbox undo."""
    import cv2

    from leadyolo_tpu.data.datasets import YoloDataset

    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    shapes = [(120, 80), (60, 200)]  # (w0, h0)
    for i, (w0, h0) in enumerate(shapes):
        cv2.imwrite(str(img_dir / f"{i}.png"), np.zeros((h0, w0, 3), np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.25 0.5\n")
    ds = YoloDataset(img_dir, img_size=64, augment=False, max_targets=4)
    gt = gt_from_yolo_dataset(ds)
    assert len(gt) == 2
    by_id = {g["image_id"]: g for g in gt}
    np.testing.assert_allclose(by_id[0]["bbox"], [45.0, 20.0, 30.0, 40.0])
    np.testing.assert_allclose(by_id[1]["bbox"], [22.5, 50.0, 15.0, 100.0])
    dt = [_dt(g["image_id"], 0, g["bbox"], 0.9) for g in gt]
    ev = COCOeval(gt, dt).run()
    assert np.isclose(ev.stats[AP], 1.0)


def test_summarize_prints_12_rows(capsys):
    gt = [_gt(1, 0, (0, 0, 10, 10))]
    dt = [_dt(1, 0, (0, 0, 10, 10), 0.9)]
    ev = COCOeval(gt, dt).run()
    ev.summarize()
    lines = [l for l in capsys.readouterr().out.splitlines() if "Average" in l]
    assert len(lines) == 12
