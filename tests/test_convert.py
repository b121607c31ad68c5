"""Dataset converters / splitters."""
import json

import cv2
import numpy as np

from leadyolo_tpu.data.convert import autosplit, coco_to_yolo, extract_boxes, labelme_to_yolo, split_dataset


def _mk_images(d, n=10):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(d / f"{i:03d}.jpg"), np.full((64, 96, 3), i * 10, np.uint8))


def test_coco_to_yolo(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 50}],
        "annotations": [{"image_id": 1, "category_id": 7, "bbox": [10, 5, 20, 10]}],
        "categories": [{"id": 7, "name": "ship"}],
    }
    (tmp_path / "ann.json").write_text(json.dumps(coco))
    n = coco_to_yolo(tmp_path / "ann.json", tmp_path / "labels")
    assert n == 1
    row = (tmp_path / "labels" / "a.txt").read_text().split()
    assert row[0] == "0"
    np.testing.assert_allclose([float(x) for x in row[1:]], [0.2, 0.2, 0.2, 0.2], atol=1e-5)


def test_labelme_to_yolo(tmp_path):
    d = {
        "imageWidth": 200,
        "imageHeight": 100,
        "shapes": [{"label": "ship", "shape_type": "rectangle", "points": [[20, 10], [60, 30]]}],
    }
    (tmp_path / "x.json").write_text(json.dumps(d))
    n = labelme_to_yolo(tmp_path, tmp_path / "labels", ["ship"])
    assert n == 1
    row = [float(v) for v in (tmp_path / "labels" / "x.txt").read_text().split()]
    np.testing.assert_allclose(row, [0, 0.2, 0.2, 0.2, 0.2], atol=1e-5)


def test_split_dataset(tmp_path):
    _mk_images(tmp_path / "images")
    (tmp_path / "labels").mkdir()
    for i in range(10):
        (tmp_path / "labels" / f"{i:03d}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    n_tr, n_te = split_dataset(tmp_path / "images", tmp_path / "out", ratio=0.7)
    assert n_tr == 7 and n_te == 3
    assert len(list((tmp_path / "out" / "labels" / "train").glob("*.txt"))) == 7


def test_autosplit(tmp_path):
    _mk_images(tmp_path / "images", 20)
    counts = autosplit(tmp_path / "images", weights=(0.8, 0.2, 0.0), seed=0)
    assert sum(counts) == 20 and counts[2] == 0
    assert (tmp_path / "autosplit_train.txt").exists()


def test_extract_boxes(tmp_path):
    _mk_images(tmp_path / "images", 3)
    (tmp_path / "labels").mkdir()
    for i in range(3):
        (tmp_path / "labels" / f"{i:03d}.txt").write_text("1 0.5 0.5 0.5 0.5\n")
    n = extract_boxes(tmp_path / "images", tmp_path / "cls")
    assert n == 3
    assert len(list((tmp_path / "cls" / "1").glob("*.jpg"))) == 3
