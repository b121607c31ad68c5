"""Mask ops + segmentation loss."""
import jax
import jax.numpy as jnp
import numpy as np

from leadyolo_tpu.ops.masks import (
    crop_mask,
    mask_iou,
    masks2segments,
    polygon2mask,
    polygons2masks,
    polygons2masks_overlap,
    process_mask,
)
from leadyolo_tpu.train.seg_loss import SegLossConfig, compute_seg_loss

ANCHORS = tuple(map(tuple, (np.array([
    [10, 13, 16, 30, 33, 23],
    [30, 61, 62, 45, 59, 119],
    [116, 90, 156, 198, 373, 326]], np.float32) / np.array([[8], [16], [32]])).tolist()))


def test_crop_mask():
    m = jnp.ones((1, 8, 8))
    out = np.asarray(crop_mask(m, jnp.array([[2.0, 2.0, 5.0, 6.0]])))
    assert out[0].sum() == 3 * 4  # x in [2,5), y in [2,6)
    assert out[0, 3, 3] == 1 and out[0, 0, 0] == 0


def test_process_mask_shapes():
    protos = jnp.ones((16, 16, 8)) * 0.1
    coefs = jnp.ones((3, 8))
    boxes = jnp.array([[0.0, 0.0, 64.0, 64.0]] * 3)
    m = process_mask(protos, coefs, boxes, (64, 64))
    assert m.shape == (3, 16, 16) and m.dtype == bool
    mu = process_mask(protos, coefs, boxes, (64, 64), upsample=True)
    assert mu.shape == (3, 64, 64)


def test_polygon_rasterization():
    poly = np.array([[2, 2], [10, 2], [10, 10], [2, 10]], np.float32)
    m = polygon2mask((16, 16), poly)
    assert m[5, 5] == 1 and m[0, 0] == 0
    stack = polygons2masks((16, 16), [poly, poly + 3])
    assert stack.shape == (2, 16, 16)
    overlap, order = polygons2masks_overlap((16, 16), [poly, poly + 3])
    assert overlap.max() == 2 and len(order) == 2


def test_masks2segments_roundtrip():
    poly = np.array([[2, 2], [12, 2], [12, 12], [2, 12]], np.float32)
    m = polygon2mask((16, 16), poly)
    segs = masks2segments(m[None])
    assert len(segs) == 1 and len(segs[0]) >= 4


def test_mask_iou():
    a = jnp.zeros((1, 16)).at[0, :8].set(1)
    b = jnp.zeros((2, 16)).at[0, :8].set(1).at[1, 4:12].set(1)
    m = np.asarray(mask_iou(a, b))
    np.testing.assert_allclose(m[0, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(m[0, 1], 4 / 12, rtol=1e-4)


def _seg_case(rng, b=2, t=4, nc=2, nm=8, img=64):
    shapes = [(img // s, img // s) for s in (8, 16, 32)]
    preds = [jnp.asarray(rng.standard_normal((b, ny, nx, 3, 5 + nc + nm), dtype=np.float32)) for ny, nx in shapes]
    proto = jnp.asarray(rng.standard_normal((b, img // 4, img // 4, nm), dtype=np.float32))
    targets = np.zeros((b, t, 5), np.float32)
    tmask = np.zeros((b, t), bool)
    targets[:, 0] = (0, 0.4, 0.4, 0.3, 0.3)
    targets[:, 1] = (1, 0.7, 0.7, 0.2, 0.2)
    tmask[:, :2] = True
    idx_map = np.zeros((b, img // 4, img // 4), np.int32)
    idx_map[:, 4:9, 4:9] = 1  # slot 0
    idx_map[:, 10:13, 10:13] = 2  # slot 1
    return preds, proto, jnp.asarray(targets), jnp.asarray(tmask), jnp.asarray(idx_map)


def test_seg_loss_finite_and_components(rng):
    preds, proto, targets, tmask, idx_map = _seg_case(rng)
    cfg = SegLossConfig(nc=2, anchors=ANCHORS, strides=(8, 16, 32))
    total, comps = compute_seg_loss(preds, proto, targets, tmask, idx_map, cfg)
    assert np.isfinite(float(total))
    for k in ("box", "obj", "cls", "seg"):
        assert np.isfinite(float(comps[k])) and float(comps[k]) >= 0


def test_seg_loss_gradients(rng):
    preds, proto, targets, tmask, idx_map = _seg_case(rng)
    cfg = SegLossConfig(nc=2, anchors=ANCHORS, strides=(8, 16, 32))

    def f(ps, pr):
        return compute_seg_loss(ps, pr, targets, tmask, idx_map, cfg)[0]

    g_preds, g_proto = jax.grad(f, argnums=(0, 1))(preds, proto)
    assert np.isfinite(np.asarray(g_proto)).all()
    for g in g_preds:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g_proto).sum()) > 0  # mask term reaches the prototypes


def test_seg_loss_no_targets(rng):
    preds, proto, targets, tmask, idx_map = _seg_case(rng)
    total, comps = compute_seg_loss(
        preds, proto, targets, jnp.zeros_like(tmask), jnp.zeros_like(idx_map),
        SegLossConfig(nc=2, anchors=ANCHORS, strides=(8, 16, 32)),
    )
    assert np.isfinite(float(total)) and float(comps["seg"]) == 0.0
