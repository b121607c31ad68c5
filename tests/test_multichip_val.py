"""Multi-chip data-parallel validation: mesh-sharded eval must reproduce the
single-device result exactly (same images, same params, same NMS) while XLA
partitions the forward over the data axis.

The reference has no distributed val (val.py always runs on one device);
this is the TPU-native scale-out path for the eval/serving side.
Runs on the conftest-pinned virtual 8-device CPU mesh.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from leadyolo_tpu.eval.validator import validate
from leadyolo_tpu.models.yolo import DetectionModel
from leadyolo_tpu.parallel.mesh import make_mesh


@pytest.fixture
def tiny_val_set(tmp_path):
    rng = np.random.default_rng(3)
    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(16):
        im = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        im = cv2.rectangle(
            im,
            (int((cx - 0.15) * 64), int((cy - 0.15) * 64)),
            (int((cx + 0.15) * 64), int((cy + 0.15) * 64)),
            (255, 255, 255),
            -1,
        )
        cv2.imwrite(str(img_dir / f"{i}.jpg"), im)
        (lbl_dir / f"{i}.txt").write_text(f"0 {cx:.4f} {cy:.4f} 0.3 0.3\n")
    return str(img_dir)


@pytest.mark.slow
def test_mesh_val_matches_single_device(tiny_val_set):
    model = DetectionModel("yolov5n", nc=1)
    variables = model.init(jax.random.PRNGKey(0), img_size=64)

    common = dict(
        img_size=64,
        batch_size=8,
        compute_dtype=jnp.float32,
        workers=2,
        rect=False,
    )
    r1 = validate(model, variables, tiny_val_set, **common)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    rm = validate(model, variables, tiny_val_set, mesh=mesh, **common)

    assert rm["seen"] == r1["seen"] == 16
    np.testing.assert_allclose(rm["map50"], r1["map50"], atol=1e-6)
    np.testing.assert_allclose(rm["map"], r1["map"], atol=1e-6)
    np.testing.assert_allclose(rm["mp"], r1["mp"], atol=1e-6)


@pytest.mark.slow
def test_mesh_val_rejects_indivisible_batch(tiny_val_set):
    model = DetectionModel("yolov5n", nc=1)
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    with pytest.raises(ValueError, match="not divisible"):
        validate(model, variables, tiny_val_set, img_size=64, batch_size=6,
                 compute_dtype=jnp.float32, workers=2, rect=False, mesh=make_mesh())
