"""Dataset features: mosaic9, copy-paste wiring, quarantine, image cache,
rect bucketing, shape-meta plumbing."""
import random
from pathlib import Path

import cv2
import numpy as np
import pytest

from leadyolo_tpu.data.datasets import YoloDataset, load_label_file, verify_image


def make_dataset(root: Path, n=6, polygons=False, sizes=None):
    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(n):
        if sizes:
            h, w = sizes[i % len(sizes)]
        else:
            h, w = int(rng.integers(100, 300)), int(rng.integers(100, 300))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.png"), img)
        if polygons:
            (root / "labels" / "train" / f"{i}.txt").write_text(
                "0 0.2 0.2 0.5 0.2 0.5 0.5 0.2 0.5\n0 0.7 0.7 0.2 0.2\n"
            )
        else:
            (root / "labels" / "train" / f"{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n")
    return root / "images" / "train"


def test_polygon_labels_become_boxes_and_segments(tmp_path):
    p = tmp_path / "poly.txt"
    p.write_text("1 0.1 0.1 0.5 0.1 0.5 0.6 0.1 0.6\n0 0.7 0.7 0.2 0.2\n")
    labels, segments = load_label_file(p)
    assert labels.shape == (2, 5)
    np.testing.assert_allclose(labels[0], [1, 0.3, 0.35, 0.4, 0.5], atol=1e-6)
    assert segments[0].shape == (4, 2) and segments[1] is None


def test_mosaic9(tmp_path):
    path = make_dataset(tmp_path, n=9)
    ds = YoloDataset(path, img_size=256, augment=True, hyp={"mosaic9": 1.0}, seed=3)
    img, labels, _ = ds.load_mosaic9(0)
    assert img.shape == (256, 256, 3)
    if len(labels):
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 256).all()
    # reachable from __getitem__ via the mosaic9 hyp
    img2, lb2 = ds[0]
    assert img2.shape == (256, 256, 3)


def test_copy_paste_wired_into_mosaic(tmp_path):
    path = make_dataset(tmp_path, n=6, polygons=True)
    ds = YoloDataset(
        path, img_size=192, augment=True,
        hyp={"copy_paste": 1.0, "degrees": 0.0, "scale": 0.2}, seed=0,
    )
    # polygon rows produce segments, so copy_paste can fire inside the mosaic
    assert any(s is not None for s in ds.segments[0])
    img, labels, _ = ds.load_mosaic(0)
    assert img.shape == (192, 192, 3)
    assert np.isfinite(labels).all()


def test_corrupt_image_quarantined(tmp_path):
    path = make_dataset(tmp_path, n=4)
    bad = tmp_path / "images" / "train" / "zz_bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 this is not really a jpeg")
    msgs = []
    ds = YoloDataset(path, img_size=128, augment=False, log_fn=msgs.append)
    assert len(ds) == 4
    assert not any("zz_bad" in f for f in ds.im_files)
    assert any("quarantined" in m for m in msgs)
    # every surviving sample loads
    for i in range(len(ds)):
        img, _ = ds[i]
        assert img.shape == (128, 128, 3)


def test_verify_image_good_and_small(tmp_path):
    ok = tmp_path / "ok.png"
    cv2.imwrite(str(ok), np.zeros((32, 48, 3), np.uint8))
    shape, msg = verify_image(ok)
    assert shape == (48, 32) and msg == ""
    tiny = tmp_path / "tiny.png"
    cv2.imwrite(str(tiny), np.zeros((4, 4, 3), np.uint8))
    shape, msg = verify_image(tiny)
    assert shape is None and "small" in msg


@pytest.mark.parametrize("mode", ["ram", "disk"])
def test_image_cache_matches_uncached(tmp_path, mode):
    path = make_dataset(tmp_path, n=4)
    plain = YoloDataset(path, img_size=128, augment=False, seed=0)
    cached = YoloDataset(path, img_size=128, augment=False, seed=0, cache_images=mode)
    for i in range(4):
        a, _, _ = plain.load_image(i)
        b, _, _ = cached.load_image(i)
        np.testing.assert_array_equal(a, b)
    if mode == "disk":
        assert any(p is not None for p in cached._npy_files)
    else:
        assert all(im is not None for im in cached._ims)


def test_rect_bucketing(tmp_path):
    # 3 wide + 3 tall images -> buckets must shrink the short axis
    path = make_dataset(tmp_path, n=6, sizes=[(100, 300), (300, 100)])
    ds = YoloDataset(path, img_size=192, augment=False, rect=True, batch_size=3, stride=32, pad=0.5)
    assert ds.batch_shapes is not None and ds.batch_shapes.shape == (2, 2)
    assert (ds.batch_shapes % 32 == 0).all()
    # sorted by aspect: first batch wide (h < w), second tall (w < h)
    assert ds.batch_shapes[0][0] < ds.batch_shapes[0][1]
    assert ds.batch_shapes[1][0] > ds.batch_shapes[1][1]
    for i in range(len(ds)):
        img, _ = ds[i]
        expect = tuple(ds.batch_shapes[ds.batch_index[i]])
        assert img.shape[:2] == expect


def test_shape_meta_roundtrip(tmp_path):
    """Boxes letterboxed via the meta must invert back to native space."""
    path = make_dataset(tmp_path, n=2, sizes=[(120, 260)])
    ds = YoloDataset(path, img_size=128, augment=False, return_shapes=True)
    img, labels, meta = ds[0]
    h0, w0, rh, rw, padw, padh = meta
    assert (h0, w0) == (120, 260)
    # invert: letterboxed xywh-normalized -> native pixels
    orig, _ = load_label_file(ds.label_files[0])
    for row, orow in zip(labels, orig):
        cx = (row[1] * img.shape[1] - padw) / rw
        cy = (row[2] * img.shape[0] - padh) / rh
        bw = row[3] * img.shape[1] / rw
        bh = row[4] * img.shape[0] / rh
        np.testing.assert_allclose(
            [cx / w0, cy / h0, bw / w0, bh / h0], orow[1:], atol=0.01
        )


def test_rect_training_batches_hit_static_bucket_set(tmp_path):
    """Rect TRAINING (reference train.py:452): augment stays on, mosaic turns
    off, and every loader batch lands on one of the dataset's closed set of
    stride-aligned canvas shapes — the property that bounds XLA recompiles."""
    from leadyolo_tpu.data.loader import DataLoader

    path = make_dataset(tmp_path, n=8, sizes=[(100, 300), (300, 100)])
    ds = YoloDataset(
        path, img_size=192, augment=True, hyp={"mosaic": 1.0, "fliplr": 0.5},
        rect=True, batch_size=4, stride=32, seed=0,
    )
    assert not ds.mosaic  # rect disables mosaic like the reference
    buckets = {tuple(s) for s in ds.batch_shapes}
    assert len(buckets) <= 2
    dl = DataLoader(ds, batch_size=4, shuffle=False, workers=2)
    seen = set()
    for imgs, targets, tmask in dl:
        assert imgs.shape[1:3] in buckets
        seen.add(imgs.shape[1:3])
        assert targets.shape[0] == imgs.shape[0] == tmask.shape[0]
    assert seen == buckets  # both canvas groups were actually emitted


def test_rect_rebucket_idempotent(tmp_path):
    """Trainer re-buckets when grad accumulation grows the loader batch;
    calling _setup_rect_shapes again must keep the sort/bucket invariants."""
    path = make_dataset(tmp_path, n=8, sizes=[(100, 300), (300, 100)])
    ds = YoloDataset(path, img_size=192, augment=False, rect=True, batch_size=2, stride=32)
    files_before = list(ds.im_files)
    ds._setup_rect_shapes(4)
    assert ds.batch_shapes.shape == (2, 2)
    assert sorted(ds.im_files) == sorted(files_before)
    ar = ds.shapes[:, 1] / ds.shapes[:, 0]
    assert (np.diff(ar) >= 0).all()  # still aspect-sorted
