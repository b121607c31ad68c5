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
