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


