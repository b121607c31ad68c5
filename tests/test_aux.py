"""Auxiliary subsystems: autoanchor, callbacks, loggers, plots, checkpoint."""
import numpy as np
import pytest

from leadyolo_tpu.utils.autoanchor import anchor_metric, kmean_anchors
from leadyolo_tpu.utils.callbacks import Callbacks


def test_anchor_metric_perfect():
    anchors = np.array([[10.0, 10.0], [50.0, 50.0]])
    wh = np.array([[10.0, 10.0], [48.0, 52.0]])
    bpr, aat = anchor_metric(anchors, wh, thr=4.0)
    assert bpr == 1.0 and aat >= 1.0


def test_anchor_metric_bad():
    anchors = np.array([[10.0, 10.0]])
    wh = np.array([[400.0, 400.0]])  # 40x bigger than anchor
    bpr, _ = anchor_metric(anchors, wh, thr=4.0)
    assert bpr == 0.0


def test_kmeans_anchors_recover_clusters(rng):
    # two tight wh clusters -> evolved anchors should cover both
    wh = np.concatenate([
        rng.normal(20, 1.0, (200, 2)),
        rng.normal(120, 4.0, (200, 2)),
    ]).clip(2)
    k = kmean_anchors(wh, n=2, img_size=640, gen=100, seed=0)
    bpr, _ = anchor_metric(k, wh, 4.0)
    assert bpr == 1.0
    areas = np.sort(k.prod(1))
    assert areas[0] < 1500 and areas[1] > 5000


def test_callbacks_bus():
    cb = Callbacks()
    seen = []
    cb.register_action("on_train_start", "t", lambda x: seen.append(x))
    cb.run("on_train_start", 42)
    assert seen == [42]
    with pytest.raises(AssertionError):
        cb.run("bogus_hook")


def test_csv_logger(tmp_path):
    from leadyolo_tpu.utils.loggers import CSVLogger

    lg = CSVLogger(tmp_path / "m.csv")
    lg.log_metrics({"loss": 1.5, "acc": 0.9}, 0)
    lg.log_metrics({"loss": 1.2, "acc": 0.95}, 1)
    lines = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith("step,loss")


def test_plot_results(tmp_path):
    from leadyolo_tpu.utils.plots import plot_results

    p = tmp_path / "results.csv"
    p.write_text("epoch,box_loss,obj_loss,cls_loss,P,R,mAP50,mAP50-95,lr,time_s\n"
                 "0,0.1,0.2,0.0,0.5,0.5,0.6,0.4,0.01,10\n1,0.09,0.19,0.0,0.6,0.6,0.7,0.5,0.009,10\n")
    out = plot_results(p)
    assert out.exists()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from leadyolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from leadyolo_tpu.train.step import TrainState
    from leadyolo_tpu.train.optim import SGDState, EMAState

    state = TrainState(
        params={"w": jnp.ones((2, 2))},
        batch_stats={"m": jnp.zeros((2,))},
        opt=SGDState({"w": jnp.zeros((2, 2))}, jnp.zeros((), jnp.int32)),
        ema=EMAState({"params": {"w": jnp.ones((2, 2))}}, jnp.zeros((), jnp.int32)),
        step=jnp.array(7, jnp.int32),
    )
    save_checkpoint(tmp_path / "x.ckpt", state, {"epoch": 3, "nc": 1})
    restored, meta = load_checkpoint(tmp_path / "x.ckpt", target=state)
    assert meta["epoch"] == 3
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)


def test_profile_layers():
    import jax

    from leadyolo_tpu.models.yolo import DetectionModel
    from leadyolo_tpu.utils.profiling import profile_layers

    m = DetectionModel("yolov5n", nc=2)
    v = m.init(jax.random.PRNGKey(0), img_size=64)
    rows = profile_layers(m, v, img_size=64, log_fn=lambda *a: None)
    assert len(rows) == len(m.net.layers)
    total = sum(r[2] for r in rows)
    assert total == m.num_params(v)
