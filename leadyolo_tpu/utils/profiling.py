"""Profiling & model info: timers, FLOPs, per-layer profiling, HBM autobatch.

Capability parity with reference utils/general.py:164-181 (Profile),
utils/torch_utils.py:151-199 (profile), :272-294 (model_info),
models/yolo.py:197-211 (per-layer profiling) and utils/autobatch.py:15-72 —
TPU-first: FLOPs come from XLA's compiled cost analysis (exact, not thop
estimates), device timing uses forced readback (the tunnel's
block_until_ready is not a reliable sync), and autobatch fits against HBM
from memory_stats().
"""
from __future__ import annotations

import time
from contextlib import ContextDecorator

import jax
import jax.numpy as jnp
import numpy as np


class Profile(ContextDecorator):
    """Accumulating wall-clock timer (reference utils/general.py:164-181)."""

    def __init__(self):
        self.t = 0.0
        self.n = 0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self._start
        self.t += self.dt
        self.n += 1
        return False


def flops(fn, *args) -> float:
    """Total FLOPs of a jitted callable via compiled cost analysis."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0))


def model_info(model, variables, img_size: int = 640, log_fn=print):
    """Params + GFLOPs summary (reference utils/torch_utils.py:272-294)."""
    n_p = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    n_b = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables.get("batch_stats", {})))
    x = jnp.zeros((1, img_size, img_size, model.ch), jnp.float32)
    try:
        g = flops(lambda v, x: model.net.apply(v, x, train=False), variables, x) / 1e9
    except Exception:
        g = float("nan")
    log_fn(
        f"model summary: {len(model.net.layers)} layers, {n_p / 1e6:.3f}M params, "
        f"{n_b / 1e3:.1f}k buffer elems, {g:.1f} GFLOPs @ {img_size}px"
    )
    return {"params": n_p, "buffers": n_b, "gflops": g, "layers": len(model.net.layers)}


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median seconds per call with forced completion."""

    def sync(out):
        leaves = jax.tree.leaves(out)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_layers(model, variables, img_size: int = 640, log_fn=print):
    """Per-layer table: type, from, params, output shape (the reference's
    parse_model print + --line-profile, models/yolo.py:197-211 & :481) via
    one eval_shape graph walk — zero compute."""
    x = jnp.zeros((1, img_size, img_size, model.ch), jnp.float32)
    net = model.net
    params = variables["params"]

    captured = []

    def walk(v, x):
        from ..nn.functional import LazyConcat

        ys = []
        out = x
        for i, (m, f) in enumerate(zip(net.layers, net.froms)):
            if f != -1:
                out = ys[f] if isinstance(f, int) else [out if j == -1 else ys[j] for j in f]
            if isinstance(out, LazyConcat) and not getattr(m, "accepts_lazy_concat", False):
                out = out.materialize()
            out = m.apply({"params": v["params"].get(f"layers_{i}", {}),
                           "batch_stats": v.get("batch_stats", {}).get(f"layers_{i}", {})}, out, train=False)
            captured.append(
                out.shape if isinstance(out, LazyConcat)
                else jax.tree.map(lambda t: getattr(t, "shape", None), out)
            )
            if i in net.save or i == len(net.layers) - 1:
                ys.append(out.materialize() if isinstance(out, LazyConcat) else out)
            else:
                ys.append(None)
        return out

    jax.eval_shape(walk, variables, x)
    rows = []
    log_fn(f"{'':>3}{'from':>12}{'params':>10}  {'module':<28}{'output'}")
    for i, (m, f) in enumerate(zip(net.layers, net.froms)):
        n_p = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params.get(f"layers_{i}", {})))
        shape = captured[i] if i < len(captured) else "?"
        row = (i, f, n_p, type(m).__name__, shape)
        rows.append(row)
        log_fn(f"{i:>3}{str(f):>12}{n_p:>10}  {type(m).__name__:<28}{shape}")
    return rows


def autobatch(step_fn, make_batch, max_fraction: float = 0.8, candidates=(1, 2, 4, 8, 16), log_fn=print):
    """Pick the largest batch fitting in max_fraction of HBM by linear fit
    over profiled memory (reference utils/autobatch.py:15-72)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats or "bytes_limit" not in stats:
        log_fn("autobatch: device memory stats unavailable; using default batch 16")
        return 16
    limit = stats["bytes_limit"]
    used = []
    for bs in candidates:
        try:
            out = step_fn(*make_batch(bs))
            jax.tree.leaves(out)[0].block_until_ready()
            used.append(dev.memory_stats().get("peak_bytes_in_use", 0))
        except Exception:
            break
    if len(used) < 2:
        return candidates[0]
    k = len(used)
    p = np.polyfit(candidates[:k], used, 1)
    best = int((limit * max_fraction - p[1]) / max(p[0], 1))
    best = max(best, 1)
    log_fn(f"autobatch: fitted batch {best} for {limit / 1e9:.1f} GB HBM at {max_fraction:.0%}")
    return best
