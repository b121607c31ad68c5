"""Export roundtrips + multi-backend."""
import jax
import jax.numpy as jnp
import numpy as np

from leadyolo_tpu.models.yolo import DetectionModel


def test_stablehlo_roundtrip(tmp_path):
    from leadyolo_tpu.cli.export import export_stablehlo
    from leadyolo_tpu.models.backend import MultiBackend

    model = DetectionModel("yolov5n", nc=2)
    v = model.init(jax.random.PRNGKey(0), img_size=64)
    out = export_stablehlo(model, v, img_size=64, batch=1, out=str(tmp_path / "m.stablehlo"))
    assert out is not None

    x = (np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3))).astype(np.uint8)
    native = np.asarray(model.apply(v, jnp.asarray(x, jnp.float32) / 255.0, train=False, decode=True))

    be = MultiBackend(out, img_size=64)
    assert be.type == "stablehlo"
    assert be.stride == (8, 16, 32) and be.nc == 2
    got = be.forward(x)
    np.testing.assert_allclose(got, native, rtol=1e-4, atol=1e-5)


def test_multibackend_ckpt(tmp_path):
    from leadyolo_tpu.models.backend import MultiBackend
    from leadyolo_tpu.utils.checkpoint import save_checkpoint

    model = DetectionModel("yolov5n", nc=2)
    v = model.init(jax.random.PRNGKey(0), img_size=64)
    save_checkpoint(tmp_path / "m.ckpt", v, {"nc": 2, "cfg": "yolov5n"})
    be = MultiBackend(str(tmp_path / "m.ckpt"), cfg="yolov5n", nc=2, img_size=64)
    be.warmup((1, 64, 64, 3))
    out = be.forward(np.zeros((1, 64, 64, 3), np.uint8))
    assert out.shape[0] == 1 and out.shape[2] == 7


def test_tflite_split_raw_heads_roundtrip(tmp_path):
    """8x8-split int8 export: the artifact emits raw per-scale head maps and
    MultiBackend decodes them in float (meta raw_heads). Wiring check: output
    shape matches the in-graph decode and boxes are finite; quantization
    *quality* evidence lives in runs/benchmarks/INT8_r04.md."""
    import pytest

    tf = pytest.importorskip("tensorflow")
    import cv2

    from leadyolo_tpu.cli.export import export_tflite
    from leadyolo_tpu.models.backend import MultiBackend

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(img_dir / f"{i}.jpg"), rng.integers(0, 256, (64, 64, 3), np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n")

    model = DetectionModel("yolov5n", nc=2)
    v = model.init(jax.random.PRNGKey(0), img_size=64)
    out = export_tflite(
        model, v, img_size=64, batch=1, out=str(tmp_path / "m.tflite"),
        int8=True, rep_data=str(img_dir), quant_mode="8x8-split",
    )
    assert out is not None

    be = MultiBackend(out, img_size=64)
    assert be.meta.get("raw_heads") is True and not be.meta.get("normalized")
    x = rng.integers(0, 256, (1, 64, 64, 3), np.uint8)
    got = be.forward(x)
    native = np.asarray(model.apply(v, jnp.asarray(x, jnp.float32) / 255.0, train=False, decode=True))
    assert got.shape == native.shape  # same anchor count and channel layout
    assert np.isfinite(got).all()
    # decode geometry sanity: xy centers stay within the (padded) canvas
    assert (got[..., :2] >= -32).all() and (got[..., :2] <= 96).all()
