"""The single jit-compiled train step: fwd + loss + bwd + clip + SGD + EMA.

This is the TPU-first collapse of the reference's hot loop body
(train.py:291-341: autocast forward, ComputeLoss, scaler.backward with DDP
all-reduce, unscale/clip/step, EMA update) into ONE compiled function under a
data-parallel mesh. bf16 forward needs no GradScaler on TPU (SURVEY.md §2.9
item 5); gradient all-reduce is inserted by XLA from the shardings.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..parallel.mesh import DATA_AXIS, batch_sharding, make_mesh, replicated
from .loss import LossConfig, compute_loss
from .optim import (
    EMAState,
    SGDState,
    clip_global_norm,
    ema_init,
    ema_update,
    linear_lf,
    one_cycle_lf,
    param_groups,
    sgd_init,
    sgd_update,
    warmup_scalars,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt: SGDState
    ema: EMAState
    step: jax.Array


def init_train_state(variables) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt=sgd_init(variables["params"]),
        ema=ema_init(variables),
        step=jnp.zeros((), jnp.int32),
    )


class TrainConfig(NamedTuple):
    loss: LossConfig
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4  # already scaled by bs*accumulate/64 (reference train.py:158)
    warmup_steps: int = 1000  # max(3 epochs, 100 iters), computed by the trainer
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    epochs: int = 300
    steps_per_epoch: int = 100
    cos_lr: bool = False
    max_grad_norm: float = 10.0
    compute_dtype: Any = jnp.float32
    freeze: Tuple[int, ...] = ()  # layer indices with frozen params (reference train.py:138-144)
    accumulate: int = 1  # micro-batch gradient accumulation (reference train.py:156-157, 330-341)


def make_train_step(model, cfg: TrainConfig, mesh=None, donate: bool = True, seg_cfg=None):
    """Build the jitted train step.

    step(state, images(B,H,W,3) float in [0,1], targets(B,T,5), tmask(B,T)
         [, mask_maps(B,mh,mw) when seg_cfg is given])
      -> (state, metrics dict)

    When ``mesh`` is given, inputs are expected batch-sharded on the leading
    axis and all state replicated; XLA derives the gradient all-reduce.
    With ``seg_cfg`` (a SegLossConfig) the model must end in a Segment head
    and the loss adds the prototype-mask term.
    """
    groups_cache = {}

    def batch_loss(params, stats, im, tg, tm, mm):
        # uint8 batches cross PCIe/ICI at 1 byte/px and normalize on device
        x = im.astype(cfg.compute_dtype)
        if im.dtype == jnp.uint8:
            x = x / 255.0
        outs, new_stats = model.net.apply(
            {"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"]
        )
        if seg_cfg is not None:
            from .seg_loss import compute_seg_loss

            dets, proto = outs
            loss, comps = compute_seg_loss(dets, proto, tg, tm, mm, seg_cfg)
        else:
            if isinstance(outs, tuple) and len(outs) == 2 and not isinstance(outs[0], jax.Array):
                outs = outs[0]  # segment head trained with the box-only loss
            loss, comps = compute_loss(outs, tg, tm, cfg.loss)
        return loss, (new_stats["batch_stats"], comps)

    def step_fn(state: TrainState, images, targets, tmask, mask_maps=None):
        lf = (one_cycle_lf if cfg.cos_lr else linear_lf)(
            state.step.astype(jnp.float32) / cfg.steps_per_epoch, cfg.epochs, cfg.lrf
        )
        lr_main, lr_bias, mom = warmup_scalars(
            state.step.astype(jnp.float32),
            float(cfg.warmup_steps),
            cfg.lr0,
            lf,
            cfg.momentum,
            cfg.warmup_momentum,
            cfg.warmup_bias_lr,
        )

        if cfg.accumulate > 1:
            # micro-batch scan: grads sum (like torch backward accumulation,
            # reference train.py:327-341), BN stats update sequentially per
            # micro-batch; peak activation memory stays at one micro-batch
            acc = cfg.accumulate
            micro = images.shape[0] // acc

            def reshape_micro(x):
                return x.reshape((acc, micro) + x.shape[1:])

            xs = [reshape_micro(v) for v in (images, targets, tmask)]
            if seg_cfg is not None:
                xs.append(reshape_micro(mask_maps))

            def micro_body(carry, xs_i):
                stats_c, grads_c, loss_c = carry
                im, tg, tm = xs_i[:3]
                mm = xs_i[3] if seg_cfg is not None else None
                (l, (new_s, comps_i)), g = jax.value_and_grad(batch_loss, has_aux=True)(
                    state.params, stats_c, im, tg, tm, mm
                )
                grads_c = jax.tree.map(jnp.add, grads_c, g)
                return (new_s, grads_c, loss_c + l), comps_i

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grads, loss), comps_seq = jax.lax.scan(
                micro_body, (state.batch_stats, zero_grads, jnp.zeros(())), tuple(xs)
            )
            comps = jax.tree.map(lambda x: x.mean(), comps_seq)
            loss = loss / acc
        else:
            (loss, (new_stats, comps)), grads = jax.value_and_grad(batch_loss, has_aux=True)(
                state.params, state.batch_stats, images, targets, tmask, mask_maps
            )
        frozen = {f"layers_{i}" for i in cfg.freeze} if cfg.freeze else set()
        if frozen:
            grads = {
                k: jax.tree.map(jnp.zeros_like, g) if k in frozen else g for k, g in grads.items()
            }
        grads, gnorm = clip_global_norm(grads, cfg.max_grad_norm)

        if "g" not in groups_cache:
            groups_cache["g"] = param_groups(state.params)
        new_params, new_opt = sgd_update(
            state.params,
            grads,
            state.opt,
            lr_main=lr_main,
            lr_bias=lr_bias,
            momentum=mom,
            weight_decay=cfg.weight_decay,
            groups=groups_cache["g"],
        )
        if frozen:
            # requires_grad=False semantics: frozen layers never move,
            # including via weight decay (reference train.py:138-144)
            new_params = {k: state.params[k] if k in frozen else v for k, v in new_params.items()}
        new_ema = ema_update(state.ema, {"params": new_params, "batch_stats": new_stats})
        new_state = TrainState(new_params, new_stats, new_opt, new_ema, state.step + 1)
        metrics = {"loss": loss, "grad_norm": gnorm, "lr": lr_main, **comps}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    n_in = 5 if seg_cfg is not None else 4
    return jax.jit(
        step_fn,
        in_shardings=(rep,) + (data,) * (n_in - 1),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
