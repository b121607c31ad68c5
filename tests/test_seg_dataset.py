"""Segmentation dataset + end-to-end seg train step."""
import cv2
import jax
import numpy as np
import pytest

from leadyolo_tpu.data.seg_datasets import SegmentDataset, load_seg_label_file


@pytest.fixture
def seg_root(tmp_path):
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / "train" / f"{i}.jpg"), img)
        # one polygon instance + one box row
        (tmp_path / "labels" / "train" / f"{i}.txt").write_text(
            "0 0.2 0.2 0.4 0.2 0.4 0.5 0.2 0.5\n"  # polygon (4 pts)
            "0 0.7 0.7 0.2 0.2\n"  # plain box
        )
    return tmp_path / "images" / "train"


def test_load_seg_label_file(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("1 0.1 0.1 0.5 0.1 0.5 0.6 0.1 0.6\n")
    labels, segs = load_seg_label_file(p)
    assert labels.shape == (1, 5)
    np.testing.assert_allclose(labels[0], [1, 0.3, 0.35, 0.4, 0.5], atol=1e-5)
    assert segs[0].shape == (4, 2)


def test_segment_dataset(seg_root):
    ds = SegmentDataset(seg_root, img_size=128, augment=False, max_targets=8)
    img, labels, mask_map = ds[0]
    assert img.shape == (128, 128, 3)
    assert len(labels) == 2
    assert mask_map.shape == (32, 32)
    # polygon instance is slot 0 -> value 1; the box-only row gets a
    # rectangle polygon so it rasterizes too (slot 1 -> value 2)
    assert mask_map.max() == 2
    assert (mask_map == 1).any() and (mask_map == 2).any()
    imgs, targets, tmask, maps = ds.collate([ds[i] for i in range(4)])
    assert maps.shape == (4, 32, 32) and tmask.sum() == 8


def test_seg_train_step(seg_root):
    import jax.numpy as jnp

    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.train import TrainConfig, init_train_state, make_train_step
    from leadyolo_tpu.train.loss import LossConfig
    from leadyolo_tpu.train.seg_loss import SegLossConfig

    model = DetectionModel("yolov5s-seg", nc=2, img_size=128)
    v = model.init(jax.random.PRNGKey(0), img_size=128)
    lcfg = LossConfig.from_hyp(model, {}, imgsz=128)
    scfg = SegLossConfig(
        nc=2, anchors=lcfg.anchors, strides=lcfg.strides,
        box_w=lcfg.box_w, obj_w=lcfg.obj_w, cls_w=lcfg.cls_w, mask_budget=8,
    )
    tcfg = TrainConfig(loss=lcfg, warmup_steps=2, epochs=2, steps_per_epoch=2)
    step = make_train_step(model, tcfg, donate=False, seg_cfg=scfg)

    ds = SegmentDataset(seg_root, img_size=128, augment=False, max_targets=8)
    imgs, targets, tmask, maps = ds.collate([ds[i] for i in range(4)])
    state = init_train_state(v)
    state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(tmask), jnp.asarray(maps))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["seg"]) > 0


def test_seg_train_step_with_accumulation(seg_root):
    """Micro-batch accumulation must keep the prototype-mask loss term
    (the scan path threads mask_maps through)."""
    import jax.numpy as jnp

    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.train import TrainConfig, init_train_state, make_train_step
    from leadyolo_tpu.train.loss import LossConfig
    from leadyolo_tpu.train.seg_loss import SegLossConfig

    model = DetectionModel("yolov5s-seg", nc=2, img_size=128)
    v = model.init(jax.random.PRNGKey(0), img_size=128)
    lcfg = LossConfig.from_hyp(model, {}, imgsz=128)
    scfg = SegLossConfig(
        nc=2, anchors=lcfg.anchors, strides=lcfg.strides,
        box_w=lcfg.box_w, obj_w=lcfg.obj_w, cls_w=lcfg.cls_w, mask_budget=8,
    )
    tcfg = TrainConfig(loss=lcfg, warmup_steps=2, epochs=2, steps_per_epoch=2, accumulate=2)
    step = make_train_step(model, tcfg, donate=False, seg_cfg=scfg)

    ds = SegmentDataset(seg_root, img_size=128, augment=False, max_targets=8)
    imgs, targets, tmask, maps = ds.collate([ds[i] for i in range(4)])
    state = init_train_state(v)
    state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(tmask), jnp.asarray(maps))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["seg"]) > 0


def test_seg_validator_runs(seg_root):
    import jax.numpy as jnp

    from leadyolo_tpu.eval.seg_validator import validate_seg
    from leadyolo_tpu.models.yolo import DetectionModel

    model = DetectionModel("yolov5s-seg", nc=2, img_size=128)
    v = model.init(jax.random.PRNGKey(0), img_size=128)
    res = validate_seg(model, v, seg_root, img_size=128, batch_size=4, max_targets=8, workers=2)
    assert res["seen"] == 4
    for k in ("box", "mask"):
        for m in ("mp", "mr", "map50", "map"):
            assert np.isfinite(res[k][m])

def test_seg_mosaic(seg_root):
    """Mosaic-with-segments: the mask map must stay aligned with the warped
    boxes — every labeled instance's mask pixels lie inside (a slightly
    dilated) version of its box, and box-only rows get rectangle masks."""
    ds = SegmentDataset(
        seg_root, img_size=128, augment=True, max_targets=16, seed=3,
        hyp={"mosaic": 1.0, "fliplr": 0.5, "scale": 0.5, "translate": 0.1},
    )
    assert ds.mosaic  # augment + hyp enables the mosaic path
    # every segment slot is populated (box rows got rectangle polygons)
    assert all(sg is not None for segs in ds.segments for sg in segs)
    found_instance = False
    for i in range(4):
        img, labels, mask_map = ds[i]
        assert img.shape == (128, 128, 3) and mask_map.shape == (32, 32)
        for slot, row in enumerate(labels):
            ys, xs = np.nonzero(mask_map == slot + 1)
            if not len(ys):
                continue  # tiny warped instances can rasterize away at 1/4 res
            found_instance = True
            cx, cy, w, h = row[1] * 128, row[2] * 128, row[3] * 128, row[4] * 128
            x1, y1, x2, y2 = (cx - w / 2) / 4, (cy - h / 2) / 4, (cx + w / 2) / 4, (cy + h / 2) / 4
            assert xs.min() >= x1 - 1.5 and xs.max() <= x2 + 1.5
            assert ys.min() >= y1 - 1.5 and ys.max() <= y2 + 1.5
    assert found_instance


def test_seg_mosaic_deterministic(seg_root):
    a = SegmentDataset(seg_root, img_size=128, augment=True, max_targets=16, seed=7,
                       hyp={"mosaic": 1.0})
    b = SegmentDataset(seg_root, img_size=128, augment=True, max_targets=16, seed=7,
                       hyp={"mosaic": 1.0})
    ia, la, ma = a[1]
    ib, lb, mb = b[1]
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(la, lb)
    np.testing.assert_array_equal(ma, mb)
