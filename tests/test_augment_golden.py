"""Golden-fixture parity tests for the host-side augmentation stack.

The fixtures (tests/fixtures/augment_golden.npz, generated once by
gen_augment_golden.py) pin the exact numeric behavior of letterbox / HSV /
random_perspective / cutout / copy_paste / mosaic4. Any restructuring of
leadyolo_tpu/data/augment.py or datasets.load_mosaic must reproduce these
byte-for-byte — preprocessing parity is bit-level (SURVEY.md §7 hard part 4).
"""
import random
from pathlib import Path

import numpy as np
import pytest

from leadyolo_tpu.data.augment import (
    augment_hsv,
    copy_paste,
    cutout,
    letterbox,
    random_perspective,
)

import sys

sys.path.insert(0, str(Path(__file__).parent))
from gen_augment_golden import FIXTURE, base_image, base_labels, mosaic_dataset  # noqa: E402


@pytest.fixture(scope="module")
def golden():
    assert FIXTURE.is_file(), "run tests/gen_augment_golden.py to create the fixture"
    return np.load(FIXTURE, allow_pickle=False)


@pytest.fixture(scope="module")
def im():
    return base_image(np.random.default_rng(0))


@pytest.mark.parametrize(
    "name,kw",
    [
        ("auto", dict(new_shape=512, auto=True)),
        ("square", dict(new_shape=(512, 512), auto=False)),
        ("noup", dict(new_shape=(800, 800), auto=False, scaleup=False)),
        ("fill", dict(new_shape=(320, 416), auto=False, scale_fill=True)),
    ],
)
def test_letterbox_golden(golden, im, name, kw):
    lb_im, ratio, pad = letterbox(im.copy(), **kw)
    np.testing.assert_array_equal(lb_im, golden[f"letterbox_{name}_im"])
    np.testing.assert_allclose([*ratio, *pad], golden[f"letterbox_{name}_meta"], rtol=0, atol=0)


def test_hsv_golden(golden, im):
    x = im.copy()
    augment_hsv(x, 0.015, 0.7, 0.4, rng=random.Random(3))
    np.testing.assert_array_equal(x, golden["hsv_im"])


@pytest.mark.parametrize(
    "name,kw,seed",
    [
        ("affine", dict(degrees=10, translate=0.2, scale=0.5, shear=5, perspective=0.0), 7),
        ("persp", dict(degrees=5, translate=0.1, scale=0.3, shear=2, perspective=0.0005), 9),
        ("border", dict(degrees=0, translate=0.1, scale=0.5, shear=0, perspective=0.0, border=(-160, -160)), 11),
    ],
)
def test_random_perspective_golden(golden, im, name, kw, seed):
    w_im, w_tg = random_perspective(im.copy(), base_labels().copy(), rng=random.Random(seed), **kw)
    np.testing.assert_array_equal(w_im, golden[f"persp_{name}_im"])
    np.testing.assert_allclose(w_tg, golden[f"persp_{name}_tg"], rtol=0, atol=1e-12)


def test_cutout_golden(golden, im):
    c_im, c_tg = cutout(im.copy(), base_labels().copy(), p=1.0, rng=random.Random(13))
    np.testing.assert_array_equal(c_im, golden["cutout_im"])
    np.testing.assert_allclose(c_tg, golden["cutout_tg"])


def test_copy_paste_golden(golden, im):
    segs = [
        np.array([[50, 80], [190, 70], [180, 200], [60, 210]], np.float32),
        np.array([[310, 110], [410, 120], [400, 170], [320, 175]], np.float32),
        np.array([[510, 310], [610, 320], [600, 450], [520, 440]], np.float32),
    ]
    cp_im, cp_tg, cp_segs = copy_paste(im.copy(), base_labels()[:3].copy(), segs, p=1.0, rng=random.Random(17))
    np.testing.assert_array_equal(cp_im, golden["copypaste_im"])
    np.testing.assert_allclose(cp_tg, golden["copypaste_tg"])
    assert len(cp_segs) == int(golden["copypaste_nsegs"][0])


def test_mosaic4_golden(golden, tmp_path):
    ds = mosaic_dataset(tmp_path)
    m_im, m_tg, _ = ds.load_mosaic(0)
    np.testing.assert_array_equal(m_im, golden["mosaic4_im"])
    np.testing.assert_allclose(m_tg, golden["mosaic4_tg"], rtol=0, atol=1e-12)


def test_photometric_augment():
    """Label-preserving photometric pipeline (reference Albumentations
    wrapper): boxes never move, image stays uint8 same-shape, and with p=1
    every transform fires (visibly changes the image)."""
    import random

    from leadyolo_tpu.data.augment import PhotometricAugment

    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    labels = np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)

    aug = PhotometricAugment(p=1.0)
    out, lb = aug(im.copy(), labels.copy(), rng=random.Random(0))
    assert out.shape == im.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(lb, labels)
    assert (out != im).any()  # at p=1 the blurs/gray/CLAHE must change pixels
    # gray fired: all three channels equal
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()

    noop, lb2 = PhotometricAugment(p=0.0)(im.copy(), labels.copy(), rng=random.Random(0))
    np.testing.assert_array_equal(noop, im)
