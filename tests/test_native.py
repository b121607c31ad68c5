"""Native C++ preprocessing engine vs the cv2 reference path."""
import time

import cv2
import numpy as np
import pytest

from leadyolo_tpu.data.augment import letterbox
from leadyolo_tpu.native import get_lib, letterbox_batch_native


@pytest.fixture(scope="module")
def native_lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native preproc library unavailable (no g++?)")
    return lib


def test_letterbox_native_matches_cv2(native_lib, rng):
    imgs = [
        (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        for h, w in [(480, 640), (300, 500), (640, 640), (123, 321)]
    ]
    out = letterbox_batch_native(imgs, 320, swap_rb=True, scaleup=False)
    assert out is not None
    batch, geom = out
    assert batch.shape == (4, 320, 320, 3)
    for i, im in enumerate(imgs):
        ref, ratio, (dw, dh) = letterbox(im, 320, auto=False, scaleup=False)
        ref_rgb = ref[:, :, ::-1]
        diff = np.abs(batch[i].astype(int) - ref_rgb.astype(int))
        # bilinear rounding: allow tiny per-pixel deviation, near-zero mean
        assert diff.max() <= 3, diff.max()
        assert diff.mean() < 0.2, diff.mean()
        np.testing.assert_allclose(geom[i, 0], ratio[0], rtol=1e-6)
        np.testing.assert_allclose(geom[i, 1], dw, atol=0.51)
        np.testing.assert_allclose(geom[i, 2], dh, atol=0.51)


def test_letterbox_native_throughput(native_lib, rng):
    imgs = [(rng.uniform(0, 255, (512, 768, 3))).astype(np.uint8) for _ in range(32)]

    t0 = time.perf_counter()
    for _ in range(3):
        letterbox_batch_native(imgs, 640, num_threads=8)
    t_native = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(3):
        np.stack([letterbox(im, 640, auto=False)[0][:, :, ::-1] for im in imgs])
    t_cv2 = (time.perf_counter() - t0) / 3

    # multithreaded native path should be in the same league as serial cv2
    # (loose bound: CI machines run this under heavy contention)
    print(f"native {t_native*1000:.1f} ms vs cv2 {t_cv2*1000:.1f} ms per 32-image batch")
    assert t_native < t_cv2 * 5, (t_native, t_cv2)


def test_resize_batch(native_lib, rng):
    import ctypes

    lib = native_lib
    src = (rng.uniform(0, 255, (4, 64, 96, 3))).astype(np.uint8)
    dst = np.empty((4, 32, 48, 3), np.uint8)
    lib.resize_batch(
        np.ascontiguousarray(src).ctypes.data_as(ctypes.c_void_p), 4, 64, 96,
        dst.ctypes.data_as(ctypes.c_void_p), 32, 48, 4,
    )
    for i in range(4):
        ref = cv2.resize(src[i], (48, 32), interpolation=cv2.INTER_LINEAR)
        assert np.abs(dst[i].astype(int) - ref.astype(int)).max() <= 3


def _png_dataset(root, n=8, sizes=((480, 640), (300, 500), (123, 321), (640, 640))):
    import cv2 as _cv2
    from pathlib import Path

    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    g = np.random.default_rng(7)
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        _cv2.imwrite(str(root / "images" / "val" / f"{i}.png"), g.integers(0, 256, (h, w, 3), dtype=np.uint8))
        (root / "labels" / "val" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.3\n0 0.25 0.3 0.1 0.2\n")
    from leadyolo_tpu.data.datasets import YoloDataset

    return root / "images" / "val", YoloDataset


@pytest.mark.parametrize("rect", [False, True])
def test_eval_batch_fastpath_bit_identical(native_lib, tmp_path, rect):
    """The wired native batch path must reproduce the per-sample cv2 path
    exactly: pre-resized eval sources make the native pass a pure
    pad+swap copy (gain == 1)."""
    path, YoloDataset = _png_dataset(tmp_path)
    ds = YoloDataset(path, img_size=160, augment=False, return_shapes=True,
                     rect=rect, batch_size=4)
    assert ds.batch_fastpath
    for start in (0, 4):
        idx = list(range(start, start + 4))
        fast = ds.get_eval_batch(idx)
        ref = ds.collate([ds[i] for i in idx])
        np.testing.assert_array_equal(fast[0], ref[0])  # pixels: bit-exact
        np.testing.assert_allclose(fast[1], ref[1], atol=1e-5)  # targets
        np.testing.assert_array_equal(fast[2], ref[2])
        np.testing.assert_allclose(fast[3], ref[3], rtol=1e-5)  # shape meta


def test_loader_uses_fastpath(native_lib, tmp_path):
    from leadyolo_tpu.data.loader import DataLoader

    path, YoloDataset = _png_dataset(tmp_path)
    ds = YoloDataset(path, img_size=160, augment=False, return_shapes=True)
    dl = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False, workers=2)
    batches = list(dl)
    assert len(batches) == 2
    ref = ds.collate([ds[i] for i in range(4)])
    np.testing.assert_array_equal(batches[0][0], ref[0])


def test_eval_batch_fastpath_throughput(native_lib, tmp_path):
    """A/B with decode factored out (RAM cache): the native single-pass batch
    assembly should clearly beat per-sample letterbox+flip+stack."""
    path, YoloDataset = _png_dataset(tmp_path, n=32, sizes=((480, 640),))
    ds = YoloDataset(path, img_size=640, augment=False, cache_images="ram")
    idx = list(range(32))
    ds.get_eval_batch(idx)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        ds.get_eval_batch(idx)
    t_native = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        ds.collate([ds[i] for i in idx])
    t_cv2 = (time.perf_counter() - t0) / 3
    print(f"batch assembly: native {t_native*1e3:.1f} ms vs per-sample {t_cv2*1e3:.1f} ms")
    # loose bound for contended CI machines; typical is >2x
    assert t_native < t_cv2, (t_native, t_cv2)


def test_assemble_tiles_matches_numpy(native_lib, rng):
    """Mosaic canvas assembly (GIL-free path) must be bit-identical to the
    numpy slice-assign it replaces, including far-side clipping."""
    from leadyolo_tpu.native import assemble_tiles_native

    tiles = []
    for _ in range(9):
        h, w = int(rng.integers(40, 200)), int(rng.integers(40, 200))
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        dy, dx = int(rng.integers(0, 300)), int(rng.integers(0, 300))
        sy, sx = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
        # deliberately oversized extents to exercise clipping
        tiles.append((img, (dy, dx, sy, sx, h, w)))
    canvas = assemble_tiles_native(tiles, (320, 320))
    assert canvas is not None and canvas.shape == (320, 320, 3)

    ref = np.full((320, 320, 3), 114, np.uint8)
    for img, (dy, dx, sy, sx, h, w) in tiles:
        h = min(h, img.shape[0] - sy, 320 - dy)
        w = min(w, img.shape[1] - sx, 320 - dx)
        if h > 0 and w > 0:
            ref[dy : dy + h, dx : dx + w] = img[sy : sy + h, sx : sx + w]
    np.testing.assert_array_equal(canvas, ref)


def test_mosaic_native_equals_fallback(native_lib, tmp_path, rng):
    """load_mosaic / load_mosaic9 must produce identical canvases through the
    native assembler and the numpy fallback (same rng draw order)."""
    from unittest import mock

    from leadyolo_tpu.data.datasets import YoloDataset
    from leadyolo_tpu.train.trainer import resolve_data

    cfg = resolve_data("ssdd")
    hyp = {"mosaic": 1.0, "degrees": 0, "translate": 0.1, "scale": 0.5}
    for builder in ("load_mosaic", "load_mosaic9"):
        ds = YoloDataset(cfg["train"], img_size=320, augment=True, hyp=hyp, seed=7)
        a, la, _ = getattr(ds, builder)(0)
        ds2 = YoloDataset(cfg["train"], img_size=320, augment=True, hyp=hyp, seed=7)
        with mock.patch("leadyolo_tpu.native.assemble_tiles_native", lambda *a, **k: None):
            b, lb, _ = getattr(ds2, builder)(0)
        np.testing.assert_array_equal(a, b, err_msg=builder)
        np.testing.assert_allclose(la, lb, err_msg=builder)
