"""Optimizer, LR schedules, warmup, EMA — functional pytree transforms.

Capability parity with reference utils/torch_utils.py:318-432 and the
schedule/warmup logic of train.py:159-169, 298-305:

- smart_optimizer's 3 param groups (decay on conv/linear kernels only; BN
  scales and biases decay-free; biases get their own warmup LR) re-expressed
  as pytree masks.
- SGD-with-nesterov exactly matches torch.optim.SGD update order; Adam/AdamW/
  RMSProp route through optax with the same decay mask.
- Warmup interpolates per-iteration lr (0 -> lr, warmup_bias_lr -> lr for the
  bias group) and momentum (warmup_momentum -> momentum) over
  max(3 epochs, 100 iters) (train.py:251, 298-305).
- ModelEMA: decay 0.9999 * (1 - exp(-updates/2000)) over params AND BN
  running stats (utils/torch_utils.py:404-432).

Everything here is jit-traceable with scalar hyperparameters as traced values,
so the whole optimizer step lives inside the one compiled train step.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


# ---------------- param-group classification ----------------


def param_groups(params):
    """Pytree of group ids: 0 = decayed kernels, 1 = norm scales / other 1-d,
    2 = biases (reference utils/torch_utils.py:322-330)."""

    def classify(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        if name == "bias":
            return 2
        if leaf.ndim > 1:
            return 0
        return 1

    return jax.tree_util.tree_map_with_path(classify, params)


# ---------------- LR schedules (reference train.py:162-166, utils/general.py:681) ----------------


def linear_lf(epoch, epochs, lrf):
    return (1.0 - epoch / epochs) * (1.0 - lrf) + lrf


def one_cycle_lf(epoch, epochs, lrf):
    return ((1.0 - jnp.cos(epoch * math.pi / epochs)) / 2.0) * (lrf - 1.0) + 1.0


def warmup_scalars(step, nw, lr0, lf_now, momentum, warmup_momentum=0.8, warmup_bias_lr=0.1):
    """Per-iteration warmup interpolation (reference train.py:298-305).

    Returns (lr_main, lr_bias, momentum_now); after ``nw`` steps all equal the
    scheduled values.
    """
    xi = jnp.clip(step / jnp.maximum(nw, 1), 0.0, 1.0)
    in_warmup = step < nw
    lr_sched = lr0 * lf_now
    lr_main = jnp.where(in_warmup, xi * lr_sched, lr_sched)
    lr_bias = jnp.where(in_warmup, warmup_bias_lr + xi * (lr_sched - warmup_bias_lr), lr_sched)
    mom = jnp.where(in_warmup, warmup_momentum + xi * (momentum - warmup_momentum), momentum)
    return lr_main, lr_bias, mom


# ---------------- SGD with torch semantics ----------------


class SGDState(NamedTuple):
    momentum_buf: Any
    step: jax.Array


def sgd_init(params):
    return SGDState(jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))


def sgd_update(params, grads, state: SGDState, *, lr_main, lr_bias, momentum, weight_decay, nesterov=True, groups=None):
    """torch.optim.SGD update: buf = m*buf + (g + wd*p); d = g+wd*p + m*buf
    (nesterov) else buf; p -= lr*d. Weight decay only on group 0; bias group
    (2) uses lr_bias."""
    if groups is None:
        groups = param_groups(params)

    def upd(p, g, buf, grp):
        g = g + jnp.where(grp == 0, weight_decay, 0.0) * p
        new_buf = momentum * buf + g
        d = g + momentum * new_buf if nesterov else new_buf
        lr = jnp.where(grp == 2, lr_bias, lr_main)
        return p - lr * d, new_buf

    flat = jax.tree.map(upd, params, grads, state.momentum_buf, groups)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, SGDState(new_buf, state.step + 1)


# ---------------- optax-backed alternatives (Adam family) ----------------


def make_optax_optimizer(name: str, lr_schedule, momentum=0.937, weight_decay=5e-4, params_example=None):
    """Adam / AdamW / RMSProp with the decay mask (reference
    utils/torch_utils.py:332-343). Returns an optax.GradientTransformation."""
    name = name.lower()
    mask = jax.tree.map(lambda g: g == 0, param_groups(params_example)) if params_example is not None else None
    if name == "adam":
        base = optax.adam(lr_schedule, b1=momentum, b2=0.999)
    elif name == "adamw":
        base = optax.adamw(lr_schedule, b1=momentum, b2=0.999, weight_decay=weight_decay, mask=mask)
        return base
    elif name == "rmsprop":
        base = optax.rmsprop(lr_schedule, momentum=momentum)
    else:
        raise ValueError(name)
    if weight_decay and mask is not None:
        return optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), base)
    return base


# ---------------- gradient clipping ----------------


def clip_global_norm(grads, max_norm=10.0):
    """clip_grad_norm_ equivalent (reference train.py:333)."""
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), gnorm


# ---------------- EMA ----------------


class EMAState(NamedTuple):
    variables: Any  # {'params': ..., 'batch_stats': ...} mirror
    updates: jax.Array


def ema_init(variables):
    return EMAState(jax.tree.map(jnp.array, variables), jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, variables, decay=0.9999, tau=2000.0):
    """d = decay * (1 - exp(-updates/tau)); ema = d*ema + (1-d)*new
    (reference utils/torch_utils.py:415-428, applied to ALL floating state
    incl. BN running stats)."""
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    new = jax.tree.map(lambda e, v: d * e + (1.0 - d) * v, state.variables, variables)
    return EMAState(new, updates)


# ---------------- early stopping / fitness ----------------


def fitness(p, r, map50, map5095):
    """0.1*mAP50 + 0.9*mAP50-95 (reference utils/metrics.py:17-20)."""
    return 0.1 * map50 + 0.9 * map5095


class EarlyStopping:
    """Patience-based stopper (reference utils/torch_utils.py:381-401)."""

    def __init__(self, patience=100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch, fi):
        if fi >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fi
        return (epoch - self.best_epoch) >= self.patience
