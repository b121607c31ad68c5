"""AP / matching / confusion-matrix metrics."""
import numpy as np

from leadyolo_tpu.ops.metrics import ConfusionMatrix, ap_per_class, compute_ap, fitness, process_batch

IOUV = np.linspace(0.5, 0.95, 10)


def test_process_batch_perfect_match():
    det = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)
    lab = np.array([[0, 10, 10, 50, 50]], np.float32)
    c = process_batch(det, lab, IOUV)
    assert c.shape == (1, 10) and c.all()


def test_process_batch_wrong_class():
    det = np.array([[10, 10, 50, 50, 0.9, 1]], np.float32)
    lab = np.array([[0, 10, 10, 50, 50]], np.float32)
    assert not process_batch(det, lab, IOUV).any()


def test_process_batch_partial_iou():
    # IoU = 0.5 box exactly: matches at 0.5 threshold only
    det = np.array([[0, 0, 100, 50, 0.9, 0]], np.float32)
    lab = np.array([[0, 0, 0, 100, 100]], np.float32)
    c = process_batch(det, lab, IOUV)
    assert c[0, 0] and not c[0, 1:].any()


def test_process_batch_greedy_unique():
    # two detections on one label: only the higher-IoU one matches
    det = np.array([[10, 10, 50, 50, 0.9, 0], [12, 12, 52, 52, 0.8, 0]], np.float32)
    lab = np.array([[0, 10, 10, 50, 50]], np.float32)
    c = process_batch(det, lab, IOUV)
    assert c[0, 0] and not c[1, 0]


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap > 0.99


def test_ap_per_class_perfect_detector():
    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(n)
    r = ap_per_class(tp, conf, pred_cls, target_cls)
    assert r["ap50"][0] > 0.99
    assert r["ap_mean"][0] > 0.99
    assert r["p"][0] > 0.99 and r["r"][0] > 0.99


def test_ap_per_class_half_fp():
    # alternating TP/FP at descending confidence -> AP ~ precision envelope
    n = 20
    tp = np.zeros((n, 10), bool)
    tp[::2] = True
    conf = np.linspace(0.9, 0.5, n)
    r = ap_per_class(tp, conf, np.zeros(n), np.zeros(10))
    assert 0.3 < r["ap50"][0] < 0.9


def test_fitness():
    assert abs(fitness(np.array([0.5, 0.5, 0.8, 0.6])) - (0.1 * 0.8 + 0.9 * 0.6)) < 1e-9


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=2)
    det = np.array([[10, 10, 50, 50, 0.9, 0], [100, 100, 150, 150, 0.8, 1]], np.float32)
    lab = np.array([[0, 10, 10, 50, 50], [0, 100, 100, 150, 150]], np.float32)
    cm.process_batch(det, lab)
    assert cm.matrix[0, 0] == 1  # correct class 0
    assert cm.matrix[1, 0] == 1  # class 0 predicted as 1
    tp, fp = cm.tp_fp()
    assert tp[0] == 1


def test_confusion_matrix_background():
    cm = ConfusionMatrix(nc=1)
    cm.process_batch(np.zeros((0, 6), np.float32), np.array([[0, 10, 10, 50, 50]], np.float32))
    assert cm.matrix[1, 0] == 1  # missed label -> background FN
