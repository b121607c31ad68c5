"""Constructibility + structural parity for every shipped model config
(the TPU analogue of the reference's `python models/yolo.py --test`
self-test, models/yolo.py:551-556), plus param-count checks against the
reference's published numbers (README.md:102-128)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leadyolo_tpu.models.yolo import ClassificationModel, DetectionModel

ALL_CONFIGS = [
    "lead-yolo",
    "yolov5n",
    "yolov5s",
    "yolov5m",
    "yolov5s-fasternet",
    "yolov5s-fasternet-rfcbam",
    "yolov5s-ghostnet",
    "yolov5s-mobilenetv3",
    "yolov5s-shufflenetv2",
    "yolov5s-efficientnet",
    "yolov5s-seg",
    "yolov5s6",
    "yolov3-tiny",
]


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_build_and_forward(name):
    m = DetectionModel(name)
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    outs = m.apply(v, x, train=False, decode=False)
    if name.endswith("-seg"):
        outs, proto = outs
        assert proto.shape[-1] == 32
    assert len(outs) == len(m.strides)
    na, no = m.head.na, m.head.no
    for o, s in zip(outs, m.strides):
        assert o.shape == (1, max(64 // s, 1), max(64 // s, 1), na, no)


@pytest.mark.parametrize(
    "name,params_m",
    [
        ("lead-yolo", 3.13),  # README.md:126-128
        ("yolov5s-fasternet", 3.05),  # README.md:120-122 (nc=1)
        ("yolov5s-fasternet-rfcbam", 3.11),  # README.md:123-125
    ],
)
def test_param_counts_match_reference(name, params_m):
    m = DetectionModel(name)
    v = m.init(jax.random.PRNGKey(0))
    got = m.num_params(v) / 1e6
    assert abs(got - params_m) < 0.02, f"{name}: {got:.3f}M vs published {params_m}M"


def test_yolov5s_baseline_param_count():
    # README.md:118 reports 7.01M for the nc=1 SSDD baseline
    m = DetectionModel("yolov5s", nc=1)
    v = m.init(jax.random.PRNGKey(0))
    got = m.num_params(v) / 1e6
    assert abs(got - 7.01) < 0.02, got


def test_strides_and_anchor_scaling():
    m = DetectionModel("lead-yolo")
    assert m.strides == (8, 16, 32)
    # anchors in grid units = px / stride
    np.testing.assert_allclose(m.anchors_grid[0][0], np.array([10.0, 13.0]) / 8)
    np.testing.assert_allclose(m.anchors_grid[2][2], np.array([373.0, 326.0]) / 32)


def test_decode_shapes_and_ranges():
    m = DetectionModel("lead-yolo")
    v = m.init(jax.random.PRNGKey(1))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    pred = m.apply(v, x, train=False, decode=True)
    n = sum((64 // s) ** 2 * m.head.na for s in m.strides)
    assert pred.shape == (2, n, m.nc + 5)
    pred = np.asarray(pred)
    assert (pred[..., 4] >= 0).all() and (pred[..., 4] <= 1).all()  # sigmoided obj
    assert (pred[..., 2:4] >= 0).all()  # wh positive


def test_detect_bias_priors():
    """Objectness bias should be initialized to the 8-objects-per-640px prior."""
    m = DetectionModel("yolov5s")
    v = m.init(jax.random.PRNGKey(0))
    head = v["params"][f"layers_{len(m.net.layers)-1}"]
    b = np.asarray(head["m_0"]["bias"]).reshape(m.head.na, m.head.no)
    expect_obj = np.log(8 / (640 / 8) ** 2)
    np.testing.assert_allclose(b[:, 4], expect_obj, rtol=1e-5)
    expect_cls = np.log(0.6 / (m.nc - 0.999999))
    np.testing.assert_allclose(b[:, 5], expect_cls, rtol=1e-5)


def test_nc_override():
    m = DetectionModel("yolov5s", nc=20)
    assert m.nc == 20 and m.head.no == 25


def test_train_mode_returns_batch_stats():
    m = DetectionModel("yolov5n")
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    outs, new_stats = m.apply(v, x, train=True)
    assert len(outs) == 3
    assert jax.tree.structure(new_stats) == jax.tree.structure(v["batch_stats"])


def test_classification_model_from_backbone():
    m = ClassificationModel("yolov5n", nc=10, cutoff=8)
    v = m.init(jax.random.PRNGKey(0), img_size=64)
    y = m.apply(v, jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert y.shape == (2, 10)


def test_tta_augmented_inference():
    m = DetectionModel("yolov5n")
    v = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    y = m.apply_augmented(v, x)
    assert y.ndim == 3 and y.shape[-1] == m.nc + 5


def test_normalized_decode_matches_pixel_decode():
    """normalize=imgsz must divide the box channels at the source and leave
    conf/cls untouched (the int8 TFLite export contract, cli/export.py)."""
    import numpy as np

    m = DetectionModel("yolov5n")
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    y_px = np.asarray(m.apply(v, x, train=False, decode=True))
    y_nm = np.asarray(m.apply(v, x, train=False, decode=True, normalize=64))
    np.testing.assert_allclose(y_nm[..., :4] * 64.0, y_px[..., :4], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(y_nm[..., 4:], y_px[..., 4:], rtol=0, atol=0)
    # xy is grid-bounded so normalized xy stays ~[0,1]; wh is anchor-scaled
    # and can exceed 1 on an untrained net
    assert float(y_nm[..., :2].max()) <= 1.5
