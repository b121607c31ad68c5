import jax.numpy as jnp
import numpy as np

from leadyolo_tpu.ops.nms import greedy_suppress, non_max_suppression

# ---------------- pure-python greedy oracle ----------------


def py_iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / (ua + 1e-7)


def py_greedy_nms(boxes, scores, thr):
    """Sequential greedy NMS; returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    kept = []
    for i in order:
        if scores[i] <= 0:
            continue
        if all(py_iou(boxes[i], boxes[j]) <= thr for j in kept):
            kept.append(i)
    return kept


def test_greedy_suppress_matches_oracle_random(rng):
    for trial in range(5):
        n = 512
        centers = rng.uniform(50, 600, size=(n, 2))
        wh = rng.uniform(10, 80, size=(n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, size=(n,)).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        boxes_s, scores_s = boxes[order], scores[order]

        keep = np.asarray(
            greedy_suppress(jnp.asarray(boxes_s), jnp.asarray(scores_s > 0), 0.5, tile=128)
        )
        got = set(np.nonzero(keep)[0].tolist())
        expect = set(py_greedy_nms(boxes_s, scores_s, 0.5))
        assert got == expect, f"trial {trial}: {len(got ^ expect)} mismatches"


def test_greedy_suppress_chain():
    # chain where each box overlaps only its neighbor: greedy keeps alternate boxes
    n = 16
    boxes = np.stack(
        [np.arange(n) * 6.0, np.zeros(n), np.arange(n) * 6.0 + 10.0, np.full(n, 10.0)], axis=1
    ).astype(np.float32)  # stride 6, width 10 -> iou(i,i+1) = 4/16 = 0.25
    active = np.ones(n, bool)
    keep = np.asarray(greedy_suppress(jnp.asarray(boxes), jnp.asarray(active), 0.2, tile=8))
    expect = np.zeros(n, bool)
    expect[::2] = True
    np.testing.assert_array_equal(keep, expect)


def _mk_pred(boxes_xywh, obj, cls_probs):
    """Assemble (1, N, 5+nc) raw prediction."""
    x = np.concatenate(
        [np.asarray(boxes_xywh, np.float32), np.asarray(obj, np.float32)[:, None], np.asarray(cls_probs, np.float32)],
        axis=1,
    )
    return jnp.asarray(x[None])


def test_nms_basic_best_class():
    # two heavily overlapping boxes, one lower score -> suppressed;
    # one distant box -> kept
    pred = _mk_pred(
        [[100, 100, 50, 50], [102, 102, 50, 50], [300, 300, 40, 40]],
        [0.9, 0.8, 0.7],
        [[0.9, 0.1], [0.9, 0.1], [0.2, 0.8]],
    )
    det, valid, _ = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=10, max_nms=64)
    det, valid = np.asarray(det[0]), np.asarray(valid[0])
    assert valid.sum() == 2
    # best box first (conf 0.81), then the distant one (0.56)
    np.testing.assert_allclose(det[0, 4], 0.81, rtol=1e-5)
    np.testing.assert_allclose(det[0, :4], [75, 75, 125, 125], rtol=1e-5)
    assert det[0, 5] == 0.0
    np.testing.assert_allclose(det[1, 4], 0.7 * 0.8, rtol=1e-5)
    assert det[1, 5] == 1.0


def test_nms_class_offset_keeps_different_classes():
    # identical boxes, different argmax class -> both kept (class-aware NMS)
    pred = _mk_pred(
        [[100, 100, 50, 50], [100, 100, 50, 50]],
        [0.9, 0.8],
        [[1.0, 0.0], [0.0, 1.0]],
    )
    det, valid, _ = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=10, max_nms=64)
    assert int(np.asarray(valid[0]).sum()) == 2
    # agnostic mode suppresses the second
    det, valid, _ = non_max_suppression(
        pred, conf_thres=0.25, iou_thres=0.45, max_det=10, max_nms=64, agnostic=True
    )
    assert int(np.asarray(valid[0]).sum()) == 1


def test_nms_multi_label_expansion():
    # one box confidently two classes -> two detections in multi_label mode
    pred = _mk_pred([[100, 100, 50, 50]], [0.9], [[0.9, 0.8]])
    det, valid, _ = non_max_suppression(
        pred, conf_thres=0.25, iou_thres=0.45, multi_label=True, max_det=10, max_nms=64
    )
    det, valid = np.asarray(det[0]), np.asarray(valid[0])
    assert valid.sum() == 2
    assert {int(det[0, 5]), int(det[1, 5])} == {0, 1}


def test_nms_conf_threshold_and_padding():
    pred = _mk_pred([[100, 100, 50, 50]], [0.1], [[0.9, 0.1]])  # obj below 0.25
    det, valid, _ = non_max_suppression(pred, conf_thres=0.25, max_det=10, max_nms=64)
    assert int(np.asarray(valid[0]).sum()) == 0
    np.testing.assert_allclose(np.asarray(det[0]), 0.0)


def test_nms_classes_filter():
    pred = _mk_pred(
        [[100, 100, 50, 50], [300, 300, 40, 40]],
        [0.9, 0.9],
        [[1.0, 0.0], [0.0, 1.0]],
    )
    det, valid, _ = non_max_suppression(pred, conf_thres=0.25, classes=(1,), max_det=10, max_nms=64)
    det, valid = np.asarray(det[0]), np.asarray(valid[0])
    assert valid.sum() == 1
    assert det[0, 5] == 1.0


def test_nms_max_det_cap():
    n = 32
    boxes = [[50 + 100 * i, 50, 20, 20] for i in range(n)]  # all disjoint
    pred = _mk_pred(boxes, [0.9] * n, [[1.0]] * n)
    det, valid, _ = non_max_suppression(pred, conf_thres=0.25, max_det=5, max_nms=64)
    assert int(np.asarray(valid[0]).sum()) == 5


def test_nms_adaptive_paths_agree(rng):
    """The lax.cond fast path (<=256 candidates) and the full path must give
    identical detections; the sparse input below takes the fast path, and
    adaptive=False forces the full path on the same data."""
    b, n = 4, 4000
    centers = rng.uniform(50, 600, size=(b, n, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, size=(b, n, 2)).astype(np.float32)
    obj = np.zeros((b, n), np.float32)
    # ~40 hot candidates per image, everything else cold
    for i in range(b):
        hot = rng.choice(n, 40, replace=False)
        obj[i, hot] = rng.uniform(0.3, 1.0, size=40)
    cls = rng.uniform(0.5, 1.0, size=(b, n, 2)).astype(np.float32)
    pred = jnp.asarray(np.concatenate([centers, wh, obj[..., None], cls], axis=-1))

    fast = non_max_suppression(pred, 0.25, 0.45, max_det=50, max_nms=1024, adaptive=True)
    full = non_max_suppression(pred, 0.25, 0.45, max_det=50, max_nms=1024, adaptive=False)
    for a, bb in zip(fast, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-6, atol=1e-6)

    # dense scores (every box active) must route to (and agree with) the full path
    pred_dense = jnp.asarray(
        np.concatenate([centers, wh, np.full((b, n, 1), 0.9, np.float32), cls], axis=-1)
    )
    fast_d = non_max_suppression(pred_dense, 0.25, 0.45, max_det=50, max_nms=1024, adaptive=True)
    full_d = non_max_suppression(pred_dense, 0.25, 0.45, max_det=50, max_nms=1024, adaptive=False)
    for a, bb in zip(fast_d, full_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-6, atol=1e-6)


def test_nms_adaptive_middle_tier_exact(rng):
    """The K=1024 middle tier (val-threshold regime: 256 < actives <= 1024
    per image, the ladder added after tools/val_speed.py --probe measured
    max 762 actives on SSDD val) must equal the forced max_nms=4096 path."""
    b, n = 2, 8000
    centers = rng.uniform(50, 600, size=(b, n, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, size=(b, n, 2)).astype(np.float32)
    obj = np.full((b, n), 1e-4, np.float32)
    for i in range(b):
        hot = rng.choice(n, 700, replace=False)  # between the 256 and 1024 tiers
        obj[i, hot] = rng.uniform(0.05, 1.0, size=700)
    cls = np.ones((b, n, 1), np.float32)
    pred = jnp.asarray(np.concatenate([centers, wh, obj[..., None], cls], axis=-1))
    fast = non_max_suppression(pred, 0.001, 0.6, max_det=300, max_nms=4096, adaptive=True)
    full = non_max_suppression(pred, 0.001, 0.6, max_det=300, max_nms=4096, adaptive=False)
    for a, bb in zip(fast, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-6, atol=1e-6)
