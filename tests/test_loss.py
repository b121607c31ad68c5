"""Dense masked target assignment + EIoU loss vs the sequential torch oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

import torch_oracles as TO
from leadyolo_tpu.train.loss import LossConfig, bce_with_logits, compute_loss, smooth_bce

ANCHORS_PX = [
    [10, 13, 16, 30, 33, 23],
    [30, 61, 62, 45, 59, 119],
    [116, 90, 156, 198, 373, 326],
]
STRIDES = (8, 16, 32)


def _grid_anchors():
    a = np.asarray(ANCHORS_PX, np.float32).reshape(3, 3, 2)
    return a / np.asarray(STRIDES, np.float32)[:, None, None]


def _make_case(rng, b=2, t=6, nc=3, img=64, spread=True):
    """Random predictions + targets. ``spread`` places targets in distinct
    regions so no two assignments collide on one (anchor, cell) — the one
    situation where the oracle's last-write and our segment-max may differ."""
    na, no = 3, nc + 5
    shapes = [(img // s, img // s) for s in STRIDES]
    preds_nhwc = [rng.standard_normal((b, ny, nx, na, no), dtype=np.float32) for ny, nx in shapes]

    targets = np.zeros((b, t, 5), np.float32)
    tmask = np.zeros((b, t), bool)
    rows = []
    for bi in range(b):
        n_real = t - 2
        for ti in range(n_real):
            if spread:
                cx = (0.15 + 0.7 * ti / n_real) + rng.uniform(0, 0.03)
                cy = 0.2 + 0.55 * bi / b + rng.uniform(0, 0.03)
            else:
                cx, cy = rng.uniform(0.1, 0.9, 2)
            w = rng.uniform(0.05, 0.4)
            h = rng.uniform(0.05, 0.4)
            cls = rng.integers(0, nc)
            targets[bi, ti] = (cls, cx, cy, w, h)
            tmask[bi, ti] = True
            rows.append((bi, cls, cx, cy, w, h))
    t_targets = torch.tensor(rows, dtype=torch.float32)
    return preds_nhwc, targets, tmask, t_targets


def test_loss_matches_torch_oracle(rng):
    nc = 3
    preds, targets, tmask, t_targets = _make_case(rng, nc=nc)
    cfg = LossConfig(nc=nc, anchors=tuple(map(tuple, _grid_anchors().reshape(3, -1).tolist())), strides=STRIDES)
    total, comps = compute_loss([jnp.asarray(p) for p in preds], jnp.asarray(targets), jnp.asarray(tmask), cfg)

    oracle = TO.TYoloLoss(_grid_anchors(), nc)
    t_preds = [torch.tensor(p.transpose(0, 3, 1, 2, 4)) for p in preds]  # (B,na,ny,nx,no)
    t_total, (t_box, t_obj, t_cls) = oracle(t_preds, t_targets)

    np.testing.assert_allclose(float(comps["box"]), t_box, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(comps["obj"]), t_obj, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(comps["cls"]), t_cls, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(total), float(t_total), rtol=2e-4)


def test_loss_single_class_skips_cls(rng):
    preds, targets, tmask, t_targets = _make_case(rng, nc=1)
    cfg = LossConfig(nc=1, anchors=tuple(map(tuple, _grid_anchors().reshape(3, -1).tolist())), strides=STRIDES)
    total, comps = compute_loss([jnp.asarray(p) for p in preds], jnp.asarray(targets), jnp.asarray(tmask), cfg)
    assert float(comps["cls"]) == 0.0
    oracle = TO.TYoloLoss(_grid_anchors(), 1)
    t_preds = [torch.tensor(p.transpose(0, 3, 1, 2, 4)) for p in preds]
    t_total, _ = oracle(t_preds, t_targets)
    np.testing.assert_allclose(float(total), float(t_total), rtol=2e-4)


def test_loss_no_targets(rng):
    preds, targets, tmask, _ = _make_case(rng)
    tmask[:] = False
    cfg = LossConfig(nc=3, anchors=tuple(map(tuple, _grid_anchors().reshape(3, -1).tolist())), strides=STRIDES)
    total, comps = compute_loss([jnp.asarray(p) for p in preds], jnp.asarray(targets), jnp.asarray(tmask), cfg)
    assert np.isfinite(float(total))
    assert float(comps["box"]) == 0.0
    assert float(comps["obj"]) > 0.0  # pure negative BCE


def test_loss_gradients_finite(rng):
    preds, targets, tmask, _ = _make_case(rng)
    cfg = LossConfig(nc=3, anchors=tuple(map(tuple, _grid_anchors().reshape(3, -1).tolist())), strides=STRIDES)

    def f(ps):
        return compute_loss(ps, jnp.asarray(targets), jnp.asarray(tmask), cfg)[0]

    grads = jax.grad(f)([jnp.asarray(p) for p in preds])
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_bce_with_logits_matches_torch(rng):
    x = rng.standard_normal((4, 7), dtype=np.float32)
    t = rng.uniform(0, 1, (4, 7)).astype(np.float32)
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t), pos_weight=1.3))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(t), pos_weight=torch.tensor([1.3]), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_smooth_bce():
    cp, cn = smooth_bce(0.1)
    assert cp == 0.95 and cn == 0.05


def test_loss_wiou_kind(rng):
    preds, targets, tmask, _ = _make_case(rng)
    cfg = LossConfig(
        nc=3, anchors=tuple(map(tuple, _grid_anchors().reshape(3, -1).tolist())),
        strides=STRIDES, iou_kind="wiou",
    )
    total, comps = compute_loss([jnp.asarray(p) for p in preds], jnp.asarray(targets), jnp.asarray(tmask), cfg)
    assert np.isfinite(float(total)) and float(comps["box"]) > 0

    def f(ps):
        return compute_loss(ps, jnp.asarray(targets), jnp.asarray(tmask), cfg)[0]

    grads = jax.grad(f)([jnp.asarray(p) for p in preds])
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
