"""Generate the augmentation golden fixtures (tests/fixtures/augment_golden.npz).

Run ONCE against a known-good implementation; test_augment_golden.py then
pins every later restructuring of the host-side augmentation code to these
exact outputs (SURVEY.md §7 hard part 4: preprocessing parity is bit-level).
"""
import random
from pathlib import Path

import cv2
import numpy as np

from leadyolo_tpu.data.augment import (
    augment_hsv,
    copy_paste,
    cutout,
    letterbox,
    random_perspective,
)
from leadyolo_tpu.data.datasets import YoloDataset

FIXTURE = Path(__file__).parent / "fixtures" / "augment_golden.npz"


def base_image(rng):
    return rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)


def base_labels():
    # cls, x1, y1, x2, y2 (pixels)
    return np.array(
        [
            [0, 40, 60, 200, 220],
            [1, 300, 100, 420, 180],
            [0, 500, 300, 620, 460],
            [2, 100, 350, 180, 430],
            [1, 250, 250, 400, 400],
            [0, 10, 10, 60, 50],
        ],
        np.float32,
    )


def mosaic_dataset(root: Path):
    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(6):
        h, w = int(rng.integers(200, 480)), int(rng.integers(200, 640))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.png"), img)
        rows = []
        for _ in range(int(rng.integers(1, 4))):
            cx, cy = rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8)
            bw, bh = rng.uniform(0.05, 0.3), rng.uniform(0.05, 0.3)
            rows.append(f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        (root / "labels" / "train" / f"{i}.txt").write_text("\n".join(rows))
    return YoloDataset(
        root / "images" / "train",
        img_size=320,
        augment=True,
        hyp={"degrees": 5.0, "translate": 0.1, "scale": 0.5, "shear": 2.0, "perspective": 0.0},
        max_targets=64,
        seed=5,
    )


def generate(mosaic_root: Path):
    rng_img = np.random.default_rng(0)
    out = {}

    # letterbox: several geometry regimes
    im = base_image(rng_img)
    for name, kw in {
        "auto": dict(new_shape=512, auto=True),
        "square": dict(new_shape=(512, 512), auto=False),
        "noup": dict(new_shape=(800, 800), auto=False, scaleup=False),
        "fill": dict(new_shape=(320, 416), auto=False, scale_fill=True),
    }.items():
        lb_im, ratio, pad = letterbox(im.copy(), **kw)
        out[f"letterbox_{name}_im"] = lb_im
        out[f"letterbox_{name}_meta"] = np.array([*ratio, *pad], np.float64)

    # HSV jitter (in-place, seeded)
    hsv_im = im.copy()
    augment_hsv(hsv_im, 0.015, 0.7, 0.4, rng=random.Random(3))
    out["hsv_im"] = hsv_im

    # random_perspective: affine path, perspective path, mosaic border path
    for name, kw, seed in [
        ("affine", dict(degrees=10, translate=0.2, scale=0.5, shear=5, perspective=0.0), 7),
        ("persp", dict(degrees=5, translate=0.1, scale=0.3, shear=2, perspective=0.0005), 9),
        ("border", dict(degrees=0, translate=0.1, scale=0.5, shear=0, perspective=0.0, border=(-160, -160)), 11),
    ]:
        w_im, w_tg = random_perspective(im.copy(), base_labels().copy(), rng=random.Random(seed), **kw)
        out[f"persp_{name}_im"] = w_im
        out[f"persp_{name}_tg"] = w_tg

    # cutout
    c_im = im.copy()
    c_im2, c_tg = cutout(c_im, base_labels().copy(), p=1.0, rng=random.Random(13))
    out["cutout_im"] = c_im2
    out["cutout_tg"] = c_tg

    # copy_paste with polygon segments
    segs = [
        np.array([[50, 80], [190, 70], [180, 200], [60, 210]], np.float32),
        np.array([[310, 110], [410, 120], [400, 170], [320, 175]], np.float32),
        np.array([[510, 310], [610, 320], [600, 450], [520, 440]], np.float32),
    ]
    cp_labels = base_labels()[:3].copy()
    cp_im = im.copy()
    cp_im2, cp_tg, cp_segs = copy_paste(cp_im, cp_labels, [s.copy() for s in segs], p=1.0, rng=random.Random(17))
    out["copypaste_im"] = cp_im2
    out["copypaste_tg"] = cp_tg
    out["copypaste_nsegs"] = np.array([len(cp_segs)])

    # mosaic4 through the dataset (PNG-backed, deterministic rng)
    ds = mosaic_dataset(mosaic_root)
    m_im, m_tg, _ = ds.load_mosaic(0)
    out["mosaic4_im"] = m_im
    out["mosaic4_tg"] = m_tg

    return out


if __name__ == "__main__":
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        data = generate(Path(td))
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(FIXTURE, **data)
    print(f"wrote {FIXTURE} ({FIXTURE.stat().st_size/1e6:.2f} MB)")
    for k, v in data.items():
        print(f"  {k}: {getattr(v, 'shape', v)}")
