"""Jitted train step: single-device, 8-device mesh, SGD/EMA semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from leadyolo_tpu.models.yolo import DetectionModel
from leadyolo_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from leadyolo_tpu.train import (
    LossConfig,
    TrainConfig,
    ema_init,
    ema_update,
    init_train_state,
    make_train_step,
    param_groups,
    sgd_init,
    sgd_update,
)


def _setup(img=64, batch=2):
    model = DetectionModel("yolov5n", nc=3)
    v = model.init(jax.random.PRNGKey(0), img_size=img)
    lcfg = LossConfig.from_hyp(model, {}, imgsz=img)
    tcfg = TrainConfig(loss=lcfg, warmup_steps=2, epochs=3, steps_per_epoch=2)
    # random (not constant) images: constant input drives train-mode BN
    # variance to ~0, where rsqrt amplifies benign all-reduce reassociation
    imgs = jax.random.uniform(jax.random.PRNGKey(7), (batch, img, img, 3), jnp.float32)
    targets = jnp.tile(jnp.array([[1.0, 0.5, 0.5, 0.25, 0.25]]), (batch, 4, 1))
    tmask = jnp.zeros((batch, 4), bool).at[:, 0].set(True)
    return model, v, tcfg, imgs, targets, tmask


def test_train_step_runs_and_descends():
    model, v, tcfg, imgs, targets, tmask = _setup()
    step = make_train_step(model, tcfg, donate=False)
    state = init_train_state(v)
    losses = []
    for _ in range(5):
        state, m = step(state, imgs, targets, tmask)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 5
    assert losses[-1] < losses[0], losses  # same batch -> loss must drop


def test_train_step_on_mesh():
    model, v, tcfg, imgs, targets, tmask = _setup(batch=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    step = make_train_step(model, tcfg, mesh=mesh, donate=False)
    state = replicate(mesh, init_train_state(v))
    imgs, targets, tmask = shard_batch(mesh, (imgs, targets, tmask))
    state, m = step(state, imgs, targets, tmask)
    assert np.isfinite(float(m["loss"]))
    # params stayed replicated (no per-device divergence)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_mesh_matches_single_device():
    """The DP mesh step must compute the same update as single-device."""
    model, v, tcfg, imgs, targets, tmask = _setup(batch=8)
    step1 = make_train_step(model, tcfg, donate=False)
    s1 = init_train_state(v)
    s1, m1 = step1(s1, imgs, targets, tmask)

    mesh = make_mesh()
    stepm = make_train_step(model, tcfg, mesh=mesh, donate=False)
    sm = replicate(mesh, init_train_state(v))
    bm = shard_batch(mesh, (imgs, targets, tmask))
    sm, mm = stepm(sm, *bm)

    np.testing.assert_allclose(float(m1["loss"]), float(mm["loss"]), rtol=2e-3)
    p1 = jax.tree.leaves(s1.params)[0]
    pm = jax.tree.leaves(sm.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(pm), rtol=1e-2, atol=1e-5)


def test_sgd_matches_torch(rng):
    """Custom SGD vs torch.optim.SGD with nesterov + group-wise decay."""
    w = rng.standard_normal((4, 3), dtype=np.float32)
    b = rng.standard_normal((4,), dtype=np.float32)
    gw = rng.standard_normal((4, 3), dtype=np.float32)
    gb = rng.standard_normal((4,), dtype=np.float32)

    params = {"lin": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    grads = {"lin": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
    st = sgd_init(params)
    lr, mom, wd = 0.01, 0.9, 5e-4
    for _ in range(3):
        params, st = sgd_update(params, grads, st, lr_main=lr, lr_bias=lr, momentum=mom, weight_decay=wd)

    tw = torch.tensor(w, requires_grad=True)
    tb = torch.tensor(b, requires_grad=True)
    opt = torch.optim.SGD(
        [{"params": [tw], "weight_decay": wd}, {"params": [tb], "weight_decay": 0.0}],
        lr=lr, momentum=mom, nesterov=True,
    )
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()
    np.testing.assert_allclose(np.asarray(params["lin"]["kernel"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["lin"]["bias"]), tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_param_groups_classification():
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 8, 16)), "bias": jnp.zeros((16,))},
        "bn": {"scale": jnp.zeros((16,)), "bias": jnp.zeros((16,))},
    }
    g = param_groups(params)
    assert g["conv"]["kernel"] == 0 and g["conv"]["bias"] == 2
    assert g["bn"]["scale"] == 1 and g["bn"]["bias"] == 2


def test_ema_ramp():
    v = {"params": {"w": jnp.zeros((2,))}, "batch_stats": {"m": jnp.zeros((2,))}}
    st = ema_init(v)
    new = {"params": {"w": jnp.ones((2,))}, "batch_stats": {"m": jnp.ones((2,))}}
    st = ema_update(st, new)
    d1 = 0.9999 * (1 - np.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(st.variables["params"]["w"]), 1 - d1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.variables["batch_stats"]["m"]), 1 - d1, rtol=1e-5)


def test_grad_accumulation_runs():
    from leadyolo_tpu.train import TrainConfig as TC

    model, v, tcfg, imgs, targets, tmask = _setup(batch=4)
    tcfg_acc = tcfg._replace(accumulate=2)
    step = make_train_step(model, tcfg_acc, donate=False)
    state = init_train_state(v)
    losses = []
    for _ in range(3):
        state, m = step(state, imgs, targets, tmask)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_grad_accumulation_matches_micro_loop():
    """The accumulate>1 scan must equal a manual per-micro-batch loop:
    grads sum (torch backward-accumulation semantics), BN stats thread
    sequentially, and the optimizer applies ONE update on the summed grads."""
    from leadyolo_tpu.train.loss import compute_loss
    from leadyolo_tpu.train.optim import (
        clip_global_norm,
        linear_lf,
        param_groups,
        sgd_update,
        warmup_scalars,
    )

    model, v, tcfg, imgs, targets, tmask = _setup(batch=4)
    acc = 2
    step = make_train_step(model, tcfg._replace(accumulate=acc), donate=False)
    s0 = init_train_state(v)
    s1, m = step(s0, imgs, targets, tmask)

    # manual micro loop
    micro = imgs.shape[0] // acc

    def loss_fn(params, stats, im, tg, tm):
        outs, new_s = model.net.apply(
            {"params": params, "batch_stats": stats},
            im.astype(tcfg.compute_dtype),
            train=True,
            mutable=["batch_stats"],
        )
        l, _ = compute_loss(outs, tg, tm, tcfg.loss)
        return l, new_s["batch_stats"]

    stats = s0.batch_stats
    grads = jax.tree.map(jnp.zeros_like, s0.params)
    total = 0.0
    for k in range(acc):
        sl = slice(k * micro, (k + 1) * micro)
        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            s0.params, stats, imgs[sl], targets[sl], tmask[sl]
        )
        grads = jax.tree.map(jnp.add, grads, g)
        total += float(l)

    np.testing.assert_allclose(float(m["loss"]), total / acc, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # reconstruct the single optimizer update from the summed grads
    lf = linear_lf(jnp.zeros(()), tcfg.epochs, tcfg.lrf)
    lr_main, lr_bias, mom = warmup_scalars(
        jnp.zeros(()), float(tcfg.warmup_steps), tcfg.lr0, lf, tcfg.momentum,
        tcfg.warmup_momentum, tcfg.warmup_bias_lr,
    )
    grads, _ = clip_global_norm(grads, tcfg.max_grad_norm)
    exp_params, _ = sgd_update(
        s0.params, grads, s0.opt, lr_main=lr_main, lr_bias=lr_bias, momentum=mom,
        weight_decay=tcfg.weight_decay, groups=param_groups(s0.params),
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(exp_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_freeze_zeroes_layer_grads():
    model, v, tcfg, imgs, targets, tmask = _setup(batch=2)
    tcfg_f = tcfg._replace(freeze=(0, 1))
    step = make_train_step(model, tcfg_f, donate=False)
    state0 = init_train_state(v)
    state1, _ = step(state0, imgs, targets, tmask)
    # frozen layers unchanged (up to weight-decay-free identity)
    for i in (0, 1):
        k = f"layers_{i}"
        a = jax.tree.leaves(state0.params[k])[0]
        b = jax.tree.leaves(state1.params[k])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # an unfrozen layer moved
    a = jax.tree.leaves(state0.params["layers_4"])[0]
    b = jax.tree.leaves(state1.params["layers_4"])[0]
    assert not np.array_equal(np.asarray(a), np.asarray(b))
